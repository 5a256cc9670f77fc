"""rgb frame evaluation on mvsec (cf. /root/reference/evals/eval_rgb/)."""
from common_frames import main

if __name__ == "__main__":
    main("mvsec", "rgb")
