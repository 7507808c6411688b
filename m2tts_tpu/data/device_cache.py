"""HBM-resident dataset staging shared by both trainers.

Incremental by design: each host batch is collated, placed on device,
and its host copy released before the next is built — peak host RAM is
one batch regardless of corpus size, and the HBM budget is enforced as
actual device bytes accumulate (not estimated up front), so an
over-budget corpus aborts to the streaming path before it can blow
either memory. (A previous version materialized the whole corpus on the
host before checking the budget — on a 1-CPU/limited-RAM host that
defeats the guard's purpose.)
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def stage_on_device(host_batches: Iterable[Dict[str, Any]],
                    put_fn: Callable[[Dict[str, Any]], Dict[str, Any]],
                    max_bytes: float,
                    ) -> Optional[List[Dict[str, Any]]]:
    """Place every batch on device; None when the budget would be exceeded.

    ``put_fn`` does any per-batch host prep (dtype casts, resampling) and
    the device_put. Byte accounting uses the DEVICE arrays' nbytes, so
    transfer-dtype halving is reflected exactly.
    """
    staged: List[Dict[str, Any]] = []
    total = 0
    for hb in host_batches:
        db = put_fn(hb)
        total += sum(int(getattr(v, "nbytes", 0)) for v in db.values())
        if total > max_bytes:
            logger.warning(
                "device data cache: staged bytes exceed the %.1f GB budget "
                "after %d batches — falling back to streaming",
                max_bytes / 1e9, len(staged) + 1)
            return None
        staged.append(db)
    if not staged:
        return None
    logger.info("device data cache: %d batches (%.1f MB) staged in HBM",
                len(staged), total / 1e6)
    return staged


def epoch_shuffled(staged: List[Dict[str, Any]], seed: int
                   ) -> Iterator[Dict[str, Any]]:
    """Infinite iterator: fresh shuffled ORDER each epoch (batch
    composition is fixed — the documented device-cache trade-off)."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(staged))
    while True:
        rng.shuffle(order)
        for i in order:
            yield staged[i]
