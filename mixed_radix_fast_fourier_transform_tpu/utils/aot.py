"""Ahead-of-time compilation and serialized export of spectral pipelines.

The serving-side runtime story (the reference C library's analogue is
"compile the .c file"): a jitted spectral pipeline — any composition of
this library's ops, including plan construction, which happens at trace
time — can be

* **AOT-compiled** (:func:`aot_compile`): trace + lower + compile NOW for
  known shapes, so the first production request pays zero compile latency,
  and inspect the cost analysis; or
* **exported** (:func:`export_transform` / :func:`load_transform`): frozen
  to a serialized StableHLO artifact (bytes) that reloads and runs WITHOUT
  this library or the plan-construction code — the deployment unit for
  serving fleets (version-stable, content-addressable, shippable to
  machines that only have jax installed).

Plans being trace-time constants is what makes this work: the exported
artifact embeds the stage matrices/twiddles as literals, so there is no
plan cache, no factorization, and no Python in the serving path.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax


def aot_compile(fn: Callable, *example_args: Any, **jit_kwargs):
    """Trace, lower and compile ``fn`` for the shapes/dtypes of
    ``example_args`` (which may be arrays or jax.ShapeDtypeStruct).

    Returns the compiled executable: call it with real arrays of the same
    shapes; ``.cost_analysis()`` / ``.memory_analysis()`` expose the
    compiler's view of the pipeline."""
    return jax.jit(fn, **jit_kwargs).lower(*example_args).compile()


def export_transform(
    fn: Callable,
    *example_args: Any,
    platforms: Sequence[str] | None = None,
) -> bytes:
    """Serialize ``jit(fn)`` for the given example shapes to a portable
    StableHLO artifact (see module docstring).  ``platforms`` optionally
    pins lowering platforms (e.g. ("tpu",) or ("cpu", "tpu")); default is
    the current backend."""
    from jax import export as _export

    exported = _export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None,
    )(*example_args)
    return bytes(exported.serialize())


def load_transform(blob: bytes) -> Callable:
    """Reload a serialized transform (from :func:`export_transform`) as a
    callable — jittable, shape-checked against the export-time signature."""
    from jax import export as _export

    exported = _export.deserialize(blob)
    return jax.jit(exported.call)
