"""Small pytree helpers shared by training and serving.

One definition of the bf16 compute-cast policy: f32 leaves become bf16,
everything else (int ids, packed-weight kernel params already in their
own dtype, bool masks) passes through. Training (`trainer._loss_fn`,
`trainer_stage2._cast`) and serving (`serving/pipeline._bf16_params`,
`serving/streaming`) all route through here so a future policy change
(e.g. keeping norm scales f32) lands everywhere at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cast_params_bf16(tree):
    """Cast every float32 leaf to bfloat16; leave other dtypes alone."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def tree_finite(tree) -> bool:
    """True iff every inexact (float/complex) leaf is fully finite.

    Host-side check (call it on `device_get` copies): guards checkpoint
    writes and rewind-snapshot refreshes against persisting a blown-up
    state that the log-interval loss check has not seen yet.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf)
        kind = a.dtype.kind
        if kind == "V":  # ml_dtypes leaf (bfloat16 host copies)
            a, kind = a.astype(np.float32), "f"
        if kind in "fc" and not np.isfinite(a).all():
            return False
    return True
