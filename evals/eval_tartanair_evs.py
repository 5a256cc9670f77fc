"""Event-voxel evaluation on tartanair (cf. /root/reference/evals/eval_evs/)."""
from common import main

if __name__ == "__main__":
    main("tartanair")
