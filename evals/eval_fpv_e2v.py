"""e2v frame evaluation on fpv (cf. /root/reference/evals/eval_e2v/)."""
from common_frames import main

if __name__ == "__main__":
    main("fpv", "e2v")
