"""Still-image codec dispatch shared by the multimodal operators.

One registry for the from-scratch stdlib decoders (png.py, jpeg.py,
gif.py, tiff.py, bmp.py): signature sniffing, decode-to-RGBA, and the
tuple of codec error types the strict/non-strict paths catch.  Adding
a codec is one line here instead of one per router in multimodal.py.
"""

from __future__ import annotations

import numpy as np

from .bmp import BmpError, decode_bmp, is_bmp
from .dicom import DicomError, decode_dicom, is_dicom
from .gif import GifError, decode_gif, is_gif
from .ico import IcoError, decode_ico, is_ico
from .jpeg import JpegError, decode_jpeg, is_jpeg
from .pcx import PcxError, decode_pcx, is_pcx
from .netpbm import PnmError, decode_pnm, is_pnm
from .xim import XimError, decode_xbm, decode_xpm, is_xbm, is_xpm
from .png import PngError, decode_png, is_png
from .psd import PsdError, decode_psd, is_psd
from .tga import TgaError, decode_tga, is_tga
from .tiff import TiffError, decode_tiff, is_tiff
from .webp import WebpError, decode_webp, is_webp

#: error types raised by any registered decoder (callers catch these to
#: apply the strict/non-strict fallback contract)
IMAGE_ERRORS = (PngError, JpegError, GifError, TiffError, BmpError,
                WebpError, IcoError, PsdError, TgaError, PcxError,
                PnmError, XimError, DicomError)

#: human-readable list for strict-mode error messages
IMAGE_FORMATS = ("PNG, JPEG (baseline/progressive/arithmetic/"
                 "lossless), GIF, TIFF, BMP, lossless WebP (VP8L), "
                 "ICO, PSD composites, PCX, NetPBM (P1-P7), XBM/XPM, "
                 "DICOM frames, and footered TGA")

_CODECS = (
    (is_png, decode_png),
    (is_jpeg, decode_jpeg),
    (is_gif, decode_gif),
    (is_tiff, decode_tiff),
    (is_bmp, decode_bmp),
    # lossless (VP8L) decodes for real; lossy VP8 raises the typed
    # WebpError boundary (strict re-raises, non-strict takes the fake)
    (is_webp, decode_webp),
    # DICM at offset 128 is a strong magic; frame 0, display-mapped
    (is_dicom, decode_dicom),
    (is_psd, decode_psd),
    (is_pcx, decode_pcx),
    # NetPBM: 2-byte magic + whitespace class — ahead of the weakest
    # two but behind every strong signature
    (is_pnm, decode_pnm),
    # X11 C-source formats: the XPM magic comment / the _width +
    # _bits[] define pair
    (is_xpm, decode_xpm),
    (is_xbm, decode_xbm),
    # last two: weak magics — ICO's sniff validates the whole
    # directory, TGA (magic-less) requires the v2.0 footer signature
    (is_ico, decode_ico),
    (is_tga, decode_tga),
)


def known_image(payload: bytes) -> bool:
    """True when the payload carries a registered still-image signature."""
    return any(sniff(payload) for sniff, _ in _CODECS)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a registered still image to (h, w, 4) uint8 RGBA.

    Raises the codec's own error type (an ``IMAGE_ERRORS`` member) on a
    malformed payload and ``NotImplementedError`` when no registered
    signature matches — the strict-mode boundary contract."""
    for sniff, decode in _CODECS:
        if sniff(payload):
            return decode(payload)
    raise NotImplementedError(
        f"strict decode supports {IMAGE_FORMATS} only (stdlib decoders); "
        "other codecs need real image libraries, not in this environment "
        "— use strict=False for the deterministic fake"
    )
