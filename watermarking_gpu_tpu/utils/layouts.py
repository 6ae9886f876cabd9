"""Row-major layout pinning for single-device jit boundaries.

XLA on TPU chooses the *entry computation's* parameter/result layouts with a
padded-size cost model. At lane-misaligned widths (e.g. the reference's
3872-wide ``4k_non_divisible.png`` sample, ``samples/make_w.bat``) the
row-major layout pads the minor dimension 3872 -> 3968 (2.5%) while the
transposed ``{1,2,0}`` layout pads only the 2160 rows (0.7%), so layout
assignment flips the jit boundary to the transposed layout — ignoring that
the Pallas custom calls constrain their operands to row-major. The result is
two full-frame relayout copies per round trip (measured +103 us/frame at 4K,
the whole ~8% penalty of ``embed_detect_4k_nd_*`` vs the aligned 4K case;
``tools/profile_roundtrip.py`` shows them as ``copy.*`` ops feeding the
entry/root). ``optimization_barrier`` does not stop the propagation (same
class as the single-row-slice trap, see ``me_kernel._block_row``).

``pinned_jit`` is ``jax.jit`` with the boundary layouts pinned to row-major
via ``jax.experimental.layout.Format`` — compile-verified to produce zero
relayout copies at 3872 width. It commits arguments to the current default
device (engines are single-device by contract; the mesh paths in
``parallel/`` build their own sharded programs and do not use this).
"""

from __future__ import annotations

import jax

__all__ = ["pinned_jit"]


def _pin_device():
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None and not isinstance(dev, str):
        return dev
    return jax.devices()[0]


def _ndim(x):
    return getattr(x, "ndim", None) if x is not None else None


def pinned_jit(fun):
    """jax.jit(fun) with row-major layouts pinned for array args/results.

    Arguments may be arrays or None (None args/kwargs pass through as empty
    pytrees). One compiled entry is cached per (arg ranks, kwarg names,
    device) structure — the same granularity jit would retrace at anyway.
    """
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    cache: dict = {}

    def fmt(ndim, sharding):
        if ndim is None or ndim < 1:
            return None
        return Format(Layout(major_to_minor=tuple(range(ndim))), sharding)

    def wrapped(*args, **kwargs):
        kw_names = tuple(sorted(kwargs))
        kwvals = tuple(kwargs[k] for k in kw_names)
        dev = _pin_device()
        key = (tuple(_ndim(a) for a in args), kw_names,
               tuple(_ndim(v) for v in kwvals), dev)
        entry = cache.get(key)
        if entry is None:
            n_pos = len(args)
            sharding = SingleDeviceSharding(dev)

            def shim(*flat):
                pos, kws = flat[:n_pos], flat[n_pos:]
                return fun(*pos, **dict(zip(kw_names, kws)))

            flat = args + kwvals
            in_s = tuple(fmt(_ndim(a), sharding) for a in flat)
            out_shape = jax.eval_shape(shim, *flat)
            out_s = jax.tree.map(
                lambda s: fmt(s.ndim, sharding) if s.ndim >= 2 else None,
                out_shape)
            entry = cache[key] = (jax.jit(shim, in_shardings=in_s,
                                          out_shardings=out_s), in_s)
        jitted, in_s = entry
        try:
            return jitted(*args, *kwvals)
        except ValueError as e:
            if "Layout passed to jit" not in str(e):
                raise
            # an argument arrived with a non-default layout (e.g. produced
            # by an auto-layout jit elsewhere); relayout it once instead of
            # failing — the pin exists precisely to stop such layouts from
            # propagating
            healed = tuple(
                a if a is None or f is None else jax.device_put(a, f)
                for a, f in zip(args + kwvals, in_s))
        return jitted(*healed)

    # jit-API compatibility shim: warmup checks use _cache_size to assert
    # pre-compilation happened (tests/test_serving.py)
    wrapped._cache_size = lambda: sum(jitted._cache_size()
                                      for jitted, _ in cache.values())
    return wrapped
