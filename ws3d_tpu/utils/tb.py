"""Scalar logging: TensorBoard writer with graceful fallback.

Equivalent of the reference's tensorboardX usage (train_utils.py:564-579):
scalars per step. Uses torch.utils.tensorboard when available (torch-cpu is
in the image); falls back to a JSONL file so training never loses metrics.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def write(self, step: int, scalars: Dict[str, float]):
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        rec = {"step": step, "ts": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
