"""pywfa_tpu: TPU-native wavefront sequence alignment.

A from-scratch JAX/Pallas re-design of the capabilities of pywfa/WFA2-lib:
exact gap-affine / dual-affine / linear / edit / indel wavefront alignment
with full-CIGAR traceback, end-to-end and ends-free spans, score-only mode,
and adaptive/X-drop/Z-drop/banded pruning — executed as batched SPMD kernels
over padded diagonal-band tensors.

Public pywfa-parity surface (reference: pywfa/__init__.py:1-6):
    WavefrontAligner, clip_cigartuples, cigartuples_to_str,
    elide_mismatches_from_cigar

TPU-native batched surface:
    pywfa_tpu.batch.BatchWavefrontAligner
"""
import os as _os


def _enable_compile_cache() -> None:
    """Persist XLA executables across processes.

    Engine configs are shape-bucketed and deterministic, so the compile cost
    (which dominates cold-start latency on remote-compile TPU setups) is paid
    once per machine.
    """
    try:
        import hashlib
        import jax
        # CPU-forced contexts get no persistent cache at all: XLA:CPU AOT
        # blobs embed the COMPILE machine's feature selection (which the
        # cpuinfo fingerprint below does not fully capture -- observed: a
        # cached blob carrying +prefer-no-gather loaded on a host whose
        # XLA target lacked it, warning of possible SIGILL). The cache
        # exists for the TPU remote-compile relay; CPU compiles are cheap.
        if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            return
        # Partition the cache by host-CPU fingerprint: XLA:CPU AOT
        # executables embed the compile machine's feature set, and loading
        # one on a host missing those features (cache dir shared across
        # machines/rounds via a persistent volume) SIGILLs/segfaults
        # inside compilation_cache.get_executable_and_time. TPU entries
        # re-compile once per machine; correctness over warm-start.
        try:
            with open("/proc/cpuinfo") as fh:
                flags = next((ln for ln in fh if ln.startswith("flags")), "")
            fp = hashlib.md5(flags.encode()).hexdigest()[:10]
        except OSError:
            fp = "nofp"
        cache_dir = _os.environ.get(
            "PYWFA_TPU_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "pywfa_tpu",
                          f"xla_cache-{fp}"))
        if not cache_dir:
            # PYWFA_TPU_CACHE="" disables the persistent cache entirely
            # (CPU-forced contexts: XLA:CPU AOT (de)serialization
            # intermittently segfaults; tests/conftest.py sets this)
            return
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

from .align import (  # noqa: F401,E402
    AlignmentResult,
    WavefrontAligner,
    clip_cigartuples,
    cigartuples_to_str,
    elide_mismatches_from_cigar,
)
from .attributes import register_match_classes  # noqa: F401,E402

__version__ = "0.1.0"

__all__ = [
    "WavefrontAligner",
    "AlignmentResult",
    "clip_cigartuples",
    "cigartuples_to_str",
    "elide_mismatches_from_cigar",
    "register_match_classes",
]
