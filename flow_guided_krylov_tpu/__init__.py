"""flow_guided_krylov_tpu — TPU-native flow-guided Krylov diagonalization.

A ground-up JAX/XLA/Pallas rebuild of the Flow-Guided-Krylov hybrid
quantum-classical pipeline: particle-conserving normalizing flows co-trained
with neural quantum states discover the support of molecular ground-state
wavefunctions; the basis is diversity-selected, expanded Selected-CI-style
with PT2 importance, and refined with sample-based Krylov quantum
diagonalization — all on TPU.

Public entry point mirrors the reference (``src/__init__.py:19-24``).
"""

__version__ = "0.1.0"

__all__ = ["FlowGuidedKrylovPipeline", "PipelineConfig"]


def _apply_platform_override():
    """Honor FGK_PLATFORM=cpu|tpu for every CLI/script.

    ``JAX_PLATFORMS`` alone is NOT enough on this image: the axon TPU
    plugin registers itself regardless, so a "CPU" run still opens the
    TPU tunnel (and blocks behind any process already using the single
    chip).  ``jax.config.update("jax_platforms", ...)`` after import is
    what actually pins the backend (tests/conftest.py does the same)."""
    import os
    plat = os.environ.get("FGK_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


_apply_platform_override()


def __getattr__(name):
    # Lazy import: keep `import flow_guided_krylov_tpu` light (no jax init)
    if name in ("FlowGuidedKrylovPipeline", "PipelineConfig",
                "run_molecular_benchmark"):
        from . import pipeline
        return getattr(pipeline, name)
    raise AttributeError(name)
