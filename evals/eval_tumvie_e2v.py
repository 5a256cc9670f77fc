"""e2v frame evaluation on tumvie (cf. /root/reference/evals/eval_e2v/)."""
from common_frames import main

if __name__ == "__main__":
    main("tumvie", "e2v")
