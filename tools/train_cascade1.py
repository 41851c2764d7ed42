"""Alias for the RCNN stage (reference public flow `train_cascade1.py`).

Equivalent to: python tools/train_cascade.py --stage rcnn ...
"""
import sys

import train_cascade

if __name__ == "__main__":
    sys.argv += ["--stage", "rcnn"]
    train_cascade.main()
