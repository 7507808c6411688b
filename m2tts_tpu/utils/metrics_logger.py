"""Training metrics sinks: CSV, JSONL, stdout, and optional wandb.

Replaces the reference's wandb-or-nothing logging (reference
training/train.py:228-238, :437-459) with dependency-free sinks; wandb is
used only when importable and configured.
"""

from __future__ import annotations

import csv
import json
import logging
import time
from pathlib import Path
from typing import Dict, Optional, Union

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, log_dir: Union[str, Path], backend: str = "csv",
                 wandb_project: Optional[str] = None, run_name: Optional[str] = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.backend = backend
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        self._jsonl_file = None
        self._wandb = None
        if backend == "wandb":
            try:
                import wandb

                wandb.init(project=wandb_project or "m2tts-tpu",
                           name=run_name)
                self._wandb = wandb
            except Exception as e:  # wandb not installed / offline
                logger.warning("wandb unavailable (%s); falling back to csv", e)
                self.backend = "csv"

    def log(self, metrics: Dict[str, float], step: int) -> None:
        row = {"step": step, "time": time.time(), **metrics}
        if self.backend == "csv":
            self._log_csv(row)
        elif self.backend == "jsonl":
            self._log_jsonl(row)
        elif self.backend == "wandb" and self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def _log_csv(self, row: Dict) -> None:
        fields = sorted(row.keys())
        if self._csv_writer is None or fields != self._csv_fields:
            if self._csv_file:
                self._csv_file.close()
            path = self.log_dir / "metrics.csv"
            new = not path.exists()
            self._csv_file = open(path, "a", newline="")
            self._csv_writer = csv.DictWriter(self._csv_file, fieldnames=fields,
                                              extrasaction="ignore")
            self._csv_fields = fields
            if new:
                self._csv_writer.writeheader()
        self._csv_writer.writerow(row)
        self._csv_file.flush()

    def _log_jsonl(self, row: Dict) -> None:
        if self._jsonl_file is None:
            self._jsonl_file = open(self.log_dir / "metrics.jsonl", "a")
        self._jsonl_file.write(json.dumps(row) + "\n")
        self._jsonl_file.flush()

    def close(self) -> None:
        # Reset handles to None so a logger closed by one train() call is
        # lazily reopened (append mode) if training is driven again — the
        # files open on first write, so close/reuse is safe.
        if self._csv_file:
            self._csv_file.close()
            self._csv_file = None
            self._csv_writer = None
            self._csv_fields = None
        if self._jsonl_file:
            self._jsonl_file.close()
            self._jsonl_file = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
