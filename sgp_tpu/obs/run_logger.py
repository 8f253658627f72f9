"""Per-run metric stream logging.

Counterpart of the reference's Lightning metric logging + (unused)
Neptune logger (``tsl/utils/neptune_utils.py``): appends metric dicts to
a JSONL stream in the run logdir and keeps artifacts alongside — a
local, egress-free observability surface that external dashboards can
tail.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, logdir: str, prefix: str = ""):
        self.logdir = logdir
        self.prefix = prefix
        os.makedirs(logdir, exist_ok=True)
        self._fp = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def log_metrics(self, metrics: Dict[str, float],
                    step: Optional[int] = None):
        rec = {f"{self.prefix}{k}": float(v) for k, v in metrics.items()}
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = step
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()

    def log_artifact(self, name: str, content: str):
        with open(os.path.join(self.logdir, name), "w") as fp:
            fp.write(content)

    def close(self):
        self._fp.close()
