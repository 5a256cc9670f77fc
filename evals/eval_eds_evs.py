"""Event-voxel evaluation on eds (cf. /root/reference/evals/eval_evs/)."""
from common import main

if __name__ == "__main__":
    main("eds")
