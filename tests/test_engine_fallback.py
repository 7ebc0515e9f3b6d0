"""Engine scoped-VMEM compile fallback.

The pallas planners budget VMEM from models calibrated standalone, but a
plan that compiles alone can OOM embedded in the full stamp program
(ops/conv3x3.py planner notes). The engine's durable answer is a one-shot
re-trace of the failing operating point with every pallas kernel routed
to XLA (core/engine.py Engine._guard) - the TRT analog is tactic/workspace
fallback at engine build (reference trt_inference/utilities.py Engine.build).
"""

import numpy as np
import pytest

from diffusiontexturepainting_tpu.core.engine import (
    Engine,
    _is_scoped_vmem_error,
)
from diffusiontexturepainting_tpu.pipeline.inpaint import StampModels


def _dummy_models():
    f = lambda *a, **k: None
    return StampModels(unet_apply=f, vae_encode_apply=f,
                       vae_decode_apply=f, params=None)


def test_is_scoped_vmem_error_classification():
    yes = [
        RuntimeError("Mosaic failed: scoped vmem limit exceeded"),
        RuntimeError("RESOURCE_EXHAUSTED: Attempting to allocate 18.3M "
                     "in vmem. Exceeded limit of 16.0M"),
        RuntimeError("mosaic error: VMEM allocation failed (OOM)"),
    ]
    no = [
        RuntimeError("Invalid argument: shape mismatch"),
        ValueError("vmem is a nice word"),  # no alloc/exceed context
        RuntimeError("HBM out of memory"),  # device OOM, not a plan bug
    ]
    for e in yes:
        assert _is_scoped_vmem_error(e), e
    for e in no:
        assert not _is_scoped_vmem_error(e), e


def test_guard_falls_back_once_on_vmem_error():
    eng = Engine(_dummy_models(), persistent_cache=False,
                 safe_models=_dummy_models())
    calls = {"primary": 0, "safe_makes": 0, "safe_calls": 0}

    def primary(x):
        calls["primary"] += 1
        raise RuntimeError("Mosaic failed: scoped vmem limit exceeded "
                           "while allocating window buffer")

    def make_safe():
        calls["safe_makes"] += 1

        def safe(x):
            calls["safe_calls"] += 1
            return x * 2.0

        return safe

    guarded = eng._guard(primary, make_safe, "stamp test")
    out = guarded(np.float32(3.0))
    assert float(out) == 6.0
    # subsequent calls go straight to the safe program
    out2 = guarded(np.float32(5.0))
    assert float(out2) == 10.0
    assert calls["primary"] == 1
    assert calls["safe_makes"] == 1
    # the safe program is jitted: its Python body traces once, later
    # same-shape calls run the compiled program
    assert calls["safe_calls"] == 1


def test_guard_reraises_other_errors():
    eng = Engine(_dummy_models(), persistent_cache=False,
                 safe_models=_dummy_models())

    def primary(x):
        raise ValueError("shape mismatch, nothing to do with memory")

    guarded = eng._guard(primary, lambda: (lambda x: x), "stamp test")
    with pytest.raises(ValueError):
        guarded(np.float32(1.0))


def test_guard_identity_without_safe_models():
    eng = Engine(_dummy_models(), persistent_cache=False)
    fn = lambda x: x
    assert eng._guard(fn, lambda: fn, "stamp test") is fn


def test_safe_trace_uses_xla_conv_dispatch():
    """The fallback trace runs under conv_impl("xla"): Conv3x3 dispatch
    inside the re-traced program must take the XLA leg even where a
    pallas plan exists."""
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.ops import conv3x3 as c3

    eng = Engine(_dummy_models(), persistent_cache=False,
                 safe_models=_dummy_models())

    seen = {}

    def primary(x):
        raise RuntimeError("mosaic scoped vmem exceeded")

    def make_safe():
        def safe(x):
            seen["impl"] = c3.current_impl()
            return x
        return safe

    guarded = eng._guard(primary, make_safe, "stamp test")
    guarded(jnp.float32(1.0))
    assert seen["impl"] == "xla"
    # and the override did not leak out of the trace
    assert c3.current_impl() is None


def test_conv_impl_is_thread_isolated():
    """The scoped conv-dispatch override is a ContextVar: the serving
    process traces programs from several threads at once (ctor async
    warmup, batched-serving executor, tornado session executors), and a
    conv_impl("xla") window in one thread must be invisible to a
    concurrent trace in another (a module global leaked it - xhigh
    round-5 review finding)."""
    import threading
    import time

    from diffusiontexturepainting_tpu.ops import conv3x3 as c3
    from diffusiontexturepainting_tpu.ops.conv3x3 import conv_impl

    inside = threading.Event()
    release = threading.Event()
    seen = {}

    def holder():
        with conv_impl("xla"):
            inside.set()
            release.wait(10)

    def observer():
        inside.wait(10)
        seen["observer"] = c3.current_impl()
        with conv_impl("pallas"):
            seen["observer_scoped"] = c3.current_impl()
        seen["observer_after"] = c3.current_impl()
        release.set()

    th1 = threading.Thread(target=holder)
    th2 = threading.Thread(target=observer)
    th1.start(); th2.start()
    th1.join(15); th2.join(15)

    # the holder's "xla" window never leaked into the observer thread,
    # the observer's own scope worked, and nothing leaked to this thread
    assert seen["observer"] is None
    assert seen["observer_scoped"] == "pallas"
    assert seen["observer_after"] is None
    assert c3.current_impl() is None
