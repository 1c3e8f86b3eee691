"""Module-level registry of persisted intermediate DataFrames.

Operators that pin DISK_ONLY intermediates (dedup.minhash_lsh_pairs,
archives.extract_with_archives / extract_with_attachments) register them
here IN ADDITION to attaching a ``_dedoc_persisted`` handle to the frame
they return. The handle alone is fragile: DataFrame wrappers are
immutable, so any downstream transformation (filter/select/union) hands
the caller a NEW object without the attribute and a convention-based
release silently misses the pinned blocks. The registry makes release
work regardless of which frame the caller still holds.

The registry is keyed by the owning SparkSession's application id so a
long-lived driver that starts and stops several sessions cannot
accumulate stale handles: frames registered under a session that has
since stopped are pruned eagerly on the next register()/release() call
(their storage died with the session — unpersist would be a no-op).

unpersist() is idempotent, so releasing through both paths is safe.
"""

from __future__ import annotations

from typing import Dict, List

_REGISTRY: Dict[str, List] = {}  # app id → persisted frames


def _app_id(frame) -> str:
    try:
        return frame.sparkSession.sparkContext.applicationId
    except Exception:
        return "<unknown>"


def _live_app_ids():
    """Application ids of sessions that still have a usable context, or
    None when liveness CANNOT be determined — getActiveSession() is
    thread-local, so a worker thread (ThreadPoolExecutor queries) sees
    None even while the session is alive. Pruning must be conservative:
    unknown liveness prunes nothing, or still-pinned frames of a live
    session would be dropped from the registry without unpersist."""
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        return {active.sparkContext.applicationId} if active is not None else None
    except Exception:
        return None


def _prune_dead() -> None:
    live = _live_app_ids()
    if live is None:
        return
    for key in [k for k in _REGISTRY if k not in live and k != "<unknown>"]:
        del _REGISTRY[key]


def register(frames) -> None:
    """Track persisted intermediate frames for session-wide release."""
    _prune_dead()
    for f in frames:
        _REGISTRY.setdefault(_app_id(f), []).append(f)


def release(df=None) -> int:
    """Unpersist pinned intermediates; returns the number released.

    With ``df`` carrying a ``_dedoc_persisted`` handle: release exactly
    those frames (and drop them from the registry). With ``df=None`` or a
    derived frame that lost the handle: release EVERY frame registered
    under a still-live session — the safety net for long-lived sessions.
    """
    _prune_dead()
    handle = getattr(df, "_dedoc_persisted", None) if df is not None else None
    # `handle == []` means "this frame pinned NOTHING" (e.g. max_depth=0)
    # and must release nothing — only a MISSING handle falls back to the
    # session-wide registry drain
    if handle is not None:
        frames = list(handle)
    else:
        frames = [f for fs in _REGISTRY.values() for f in fs]
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass
        bucket = _REGISTRY.get(_app_id(f))
        if bucket is not None:
            try:
                bucket.remove(f)
            except ValueError:
                pass
    _prune_dead()
    return n
