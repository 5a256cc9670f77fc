"""e2v frame evaluation on vector (cf. /root/reference/evals/eval_e2v/)."""
from common_frames import main

if __name__ == "__main__":
    main("vector", "e2v")
