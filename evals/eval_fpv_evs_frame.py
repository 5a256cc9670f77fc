"""evs_frame frame evaluation on fpv (cf. /root/reference/evals/eval_evs_frame/)."""
from common_frames import main

if __name__ == "__main__":
    main("fpv", "evs_frame")
