"""rgb frame evaluation on tumvie (cf. /root/reference/evals/eval_rgb/)."""
from common_frames import main

if __name__ == "__main__":
    main("tumvie", "rgb")
