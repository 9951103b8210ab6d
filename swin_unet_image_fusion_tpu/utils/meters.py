"""Host-side windowed loss averaging.

Functional replacement for the reference's recorder-backed running means
(``/root/reference/a008_loss.py:284-310``): per-term values accumulate on the host
(fetched asynchronously, no per-step device sync) and ``mean_and_clear`` returns the
rounded means exactly like ``calcu_history_mean_and_clear_and_save_to_mean_recorder``.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


class LossMeter:
    def __init__(self):
        self._records: List[Dict[str, float]] = []
        self.history: List[Dict[str, float]] = []  # the reference's mean_loss_recorder

    def record(self, terms: Dict[str, float]) -> None:
        self._records.append({k: float(v) for k, v in terms.items()})

    def __len__(self) -> int:
        return len(self._records)

    def mean_and_clear(self) -> Dict[str, float]:
        """Means of everything recorded since the last call, then clear (a008:284-310)."""
        if not self._records:
            return {}
        keys = self._records[0].keys()
        means = {
            f"{k}_mean": round(float(np.mean([r[k] for r in self._records])), 5)
            for k in keys
        }
        self._records.clear()
        self.history.append(means)
        return means
