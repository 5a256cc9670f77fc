"""e2v frame evaluation on hku (cf. /root/reference/evals/eval_e2v/)."""
from common_frames import main

if __name__ == "__main__":
    main("hku", "e2v")
