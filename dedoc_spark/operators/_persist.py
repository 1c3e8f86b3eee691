"""Module-level registry of persisted intermediate DataFrames.

Operators that pin DISK_ONLY intermediates (dedup.minhash_lsh_pairs,
archives.extract_with_archives / extract_with_attachments) register them
here IN ADDITION to attaching a ``_dedoc_persisted`` handle to the frame
they return. The handle alone is fragile: DataFrame wrappers are
immutable, so any downstream transformation (filter/select/union) hands
the caller a NEW object without the attribute and a convention-based
release silently misses the pinned blocks. The registry makes release
work regardless of which frame the caller still holds.

unpersist() is idempotent, so releasing through both paths is safe.
"""

from __future__ import annotations

_REGISTRY: list = []


def register(frames) -> None:
    """Track persisted intermediate frames for session-wide release."""
    _REGISTRY.extend(frames)


def release(df=None) -> int:
    """Unpersist pinned intermediates; returns the number released.

    With ``df`` carrying a ``_dedoc_persisted`` handle: release exactly
    those frames (and drop them from the registry). With ``df=None`` or a
    derived frame that lost the handle: release EVERY registered frame —
    the safety net for long-lived sessions.
    """
    handle = getattr(df, "_dedoc_persisted", None) if df is not None else None
    # `handle == []` means "this frame pinned NOTHING" (e.g. max_depth=0)
    # and must release nothing — only a MISSING handle falls back to the
    # session-wide registry drain
    frames = list(handle) if handle is not None else list(_REGISTRY)
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass
        try:
            _REGISTRY.remove(f)
        except ValueError:
            pass
    return n
