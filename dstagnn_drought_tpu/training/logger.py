"""Structured metric logging: JSONL on disk + stdout lines.

Replaces the reference's scattered prints and its dead tensorboardX wiring
(SummaryWriter imported but never constructed — train_DSTAGNN_my.py:16,
lib/utils1.py:377; SURVEY.md §5 observability)."""
from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
    def __init__(self, path: str | None = None, stream=None, quiet: bool = False):
        self._file = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a")
        self._stream = stream or sys.stdout
        self._quiet = quiet
        self._t0 = time.time()

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if not self._quiet:
            kv = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}", file=self._stream, flush=True)

    def close(self):
        if self._file:
            self._file.close()
