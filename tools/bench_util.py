"""Shared measurement helpers for the component benchmark tools.

Two-count slope methodology (docs/PERFORMANCE.md): each variant runs K
iterations inside one jit with a forced data dependency, closed by one real
D2H pull; the slope between two K values cancels the tunnel's fixed sync
cost. Single windows swing +-25% on the tunneled harness — take the best of
several slopes.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from watermarking_gpu_tpu.ops.pallas import me_kernel as mk
from watermarking_gpu_tpu.ops.pallas.common import interpret_mode

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def measure(make_fn, args, k_small=4, k_large=16, reps=3):
    """Two-count slope of `make_fn(k)` in seconds per call.

    Slope of PER-COUNT MINIMA, not min-of-slopes: tunnel stalls only ever
    ADD time, so the min over reps is the cleanest estimate of each
    window, and sloping the minima cannot be biased by a stall that lands
    in one small window (min-of-slopes fakes a too-good — or negative —
    slope exactly that way; see CLAUDE.md)."""
    fns = {}
    for k in (k_small, k_large):
        fns[k] = jax.jit(make_fn(k))
        np.asarray(jax.tree.leaves(fns[k](*args))[-1])   # compile+warm

    def window(k):
        t0 = time.perf_counter()
        out = fns[k](*args)
        np.asarray(jax.tree.leaves(out)[-1])
        return time.perf_counter() - t0

    window(k_small)  # stabilize
    t_small = min(window(k_small) for _ in range(reps))
    t_large = min(window(k_large) for _ in range(reps))
    return (t_large - t_small) / (k_large - k_small)


def gram_partials_only(img_p, rows, cols, pad, strip, rows_padded):
    """The gram kernel's (B, 16, W+2) lane partials, without the XLA
    assembly stage — for isolating kernel time from assembly time."""
    batch = img_p.shape[0]
    return pl.pallas_call(
        partial(mk._me_gram_kernel, pad=pad, strip=strip, width=cols,
                rows=rows, masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, cols + 2), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 16, cols + 2), jnp.float32),
        interpret=interpret_mode(),
    )(img_p)
