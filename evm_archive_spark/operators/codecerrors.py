"""Exception normalization for the from-scratch codec decoders.

The multimodal operators' ``strict=False`` contract (multimodal.py) is
"a dirty payload never fails the Spark job": their fallback catches are
typed on each codec's own error class (GifError, WavError, ...) plus
``NotImplementedError``.  The decoders, however, parse untrusted bytes
with ``struct.unpack``, slicing, and ``np.frombuffer`` — a payload
truncated at just the wrong offset surfaces as ``struct.error``,
``IndexError``, or a plain ``ValueError`` (e.g. ``np.frombuffer`` on a
float-WAV whose data chunk is not a multiple of 4, or the ragged-row
``np.array`` on a truncated multi-channel ADPCM body), escaping the
typed catches and killing the task.

``guard``/``guard_iter`` wrap each decoder's public entry point and
re-raise those stray parsing exceptions as the codec's own error type,
so the documented contract holds for arbitrary corrupt input.  The
codec's own error class (and ``NotImplementedError`` strict-mode
boundaries) pass through untouched.
"""

from __future__ import annotations

import functools
import struct
import zlib

# The exception types a truncated/corrupt payload can realistically
# surface from stdlib/numpy parsing primitives.  Deliberately NOT
# Exception: programming errors (TypeError, AttributeError, ...) should
# still fail loudly.
_STRAY = (
    struct.error,
    IndexError,
    ValueError,
    KeyError,
    OverflowError,
    EOFError,
    zlib.error,
)


def guard(err_cls):
    """Decorator: re-raise stray parsing exceptions as ``err_cls``."""

    def deco(fn):
        @functools.wraps(fn)
        def run(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (err_cls, NotImplementedError):
                raise
            except _STRAY as e:
                raise err_cls(f"corrupt payload: {e!r}") from e

        return run

    return deco


def guard_iter(err_cls):
    """``guard`` for generator functions: errors raised mid-iteration
    (not just at call time) are normalized too."""

    def deco(fn):
        @functools.wraps(fn)
        def run(*args, **kwargs):
            try:
                yield from fn(*args, **kwargs)
            except (err_cls, NotImplementedError):
                raise
            except _STRAY as e:
                raise err_cls(f"corrupt payload: {e!r}") from e

        return run

    return deco
