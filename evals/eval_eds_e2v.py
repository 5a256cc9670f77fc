"""e2v frame evaluation on eds (cf. /root/reference/evals/eval_e2v/)."""
from common_frames import main

if __name__ == "__main__":
    main("eds", "e2v")
