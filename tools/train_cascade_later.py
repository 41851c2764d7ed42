"""Alias for the IOUN cascade stage (reference `train_cascade_later.py`).

Equivalent to: python tools/train_cascade.py --stage ioun ...
(loads an RCNN pretrain via --ckpt; the RCNN trunk is frozen).
"""
import sys

import train_cascade

if __name__ == "__main__":
    sys.argv += ["--stage", "ioun"]
    train_cascade.main()
