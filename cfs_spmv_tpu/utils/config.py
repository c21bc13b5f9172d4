"""Runtime configuration.

TPU-native replacement for the reference's three-layer config system
(autoconf flags + compile-time defines + ``CFS_NUM_THREADS`` env var, see
``configure.ac:48-67``, ``src/Makefile.am:5``, ``src/runtime.cpp:10-21``).
Everything is a runtime knob here; env vars use the same ``CFS_`` prefix.

Tunable constants mirror the reference's ``static constexpr`` members
(``csr_matrix.hpp:89-94``): ``BlkFactor=16`` row blocking becomes the
128-row / 128-lane tile of the TPU layout; ``HybBwThreshold=10000`` becomes
the window span that triggers spilling to the scattered stream.
"""

from __future__ import annotations

import dataclasses
import os

__all__ = ["Config", "config", "env_int", "env_flag"]


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    try:
        return int(v)
    except ValueError as e:
        raise ValueError(f"bad integer for ${name}: {v!r}") from e


def env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@dataclasses.dataclass
class Config:
    # --- tuning ---
    #: far-stream fraction above which tune() warns that the symmetric
    #: layout is a bad fit (analog of the HYB threshold decision,
    #: ref csr_matrix.tpp:313-401)
    spill_warn_fraction: float = 0.3

    # --- runtime ---
    #: number of devices to use (0 = all); env CFS_NUM_DEVICES mirrors the
    #: reference's CFS_NUM_THREADS (src/runtime.cpp:10-21)
    num_devices: int = dataclasses.field(
        default_factory=lambda: env_int("CFS_NUM_DEVICES", 0)
    )
    #: force Pallas interpret mode (automatic on CPU backends)
    interpret: bool = dataclasses.field(
        default_factory=lambda: env_flag("CFS_INTERPRET", False)
    )
    #: split the one-sided word-path packed stream into int8 q + 4-bit
    #: window nibbles (1.5 B/slot of index traffic instead of 2 — the
    #: kernel is stream-DMA-bound; measured on the audikw far stream)
    nib_streams: bool = dataclasses.field(
        default_factory=lambda: env_flag("CFS_NIB", True)
    )
    #: fp64-on-TPU execution path: "df" = double-float Pallas kernel
    #: (fp32 hi+lo pairs, ~2^-48 relative, ops/bell2_df.py — the default
    #: and ~400x faster), "xla" = the emulated XLA ELL+COO path
    fp64_path: str = dataclasses.field(
        default_factory=lambda: os.environ.get("CFS_FP64", "df")
    )
    #: plan cache directory ("" disables); improvement over the reference,
    #: which re-parses and re-tunes from scratch every run (SURVEY §5)
    plan_cache_dir: str = dataclasses.field(
        default_factory=lambda: os.environ.get("CFS_PLAN_CACHE", "")
    )
    #: verbose [INFO] logging (runtime flag replacing compile-time
    #: _LOG_INFO, ref configure.ac:64-67)
    log_info: bool = dataclasses.field(
        default_factory=lambda: env_flag("CFS_LOG", False)
    )
    #: persistent XLA compilation cache directory (set "" to disable);
    #: SDIA kernels are compiled per matrix (static offsets), so this is
    #: the preprocessing-time analog of the plan cache — default ON
    #: (136 s -> 6 s second-process tune+apply on a stencil)
    compile_cache_dir: str = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "CFS_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "cfs_spmv_tpu", "xla"
            ),
        )
    )


def apply_jax_compile_cache() -> None:
    """Enable the persistent XLA compile cache if configured (idempotent,
    called at package import; safe before backend init)."""
    if not config.compile_cache_dir:
        return
    import jax

    try:
        os.makedirs(config.compile_cache_dir, exist_ok=True)
        jax.config.update(
            "jax_compilation_cache_dir", config.compile_cache_dir
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except (OSError, AttributeError):  # unwritable HOME / old jax
        pass


#: process-global config instance (mutable; tests may override fields)
config = Config()
