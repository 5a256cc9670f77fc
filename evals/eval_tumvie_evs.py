"""Event-voxel evaluation on tumvie (cf. /root/reference/evals/eval_evs/)."""
from common import main

if __name__ == "__main__":
    main("tumvie")
