"""Streaming helpers (devo_tpu/data/stream.py)."""
import time

import pytest

from devo_tpu.data.stream import buffered


def test_buffered_passthrough():
    assert list(buffered(iter(range(20)), maxsize=4)) == list(range(20))


def test_buffered_propagates_producer_error():
    """An iterator error must surface in the consumer, not strand it on
    q.get() forever (the producer always terminates the queue)."""
    def bad():
        yield 1
        yield 2
        raise OSError("corrupt h5 mid-sequence")

    it = buffered(bad(), maxsize=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(OSError, match="corrupt h5"):
        next(it)


def test_buffered_consumer_early_exit_releases_producer():
    """Closing the consumer generator unblocks a producer stuck on a full
    queue (daemon thread would otherwise hold the source open forever)."""
    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield i

    it = buffered(src(), maxsize=2)
    assert next(it) == 0
    it.close()                      # triggers the finally -> stop event
    time.sleep(0.6)                 # > producer put timeout
    n = len(produced)
    time.sleep(0.4)
    assert len(produced) == n       # producer stopped, not spinning
    assert n < 1000
