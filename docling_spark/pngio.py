"""PIL-compatible PNG re-encoding (stdlib zlib + numpy only).

The reference pipeline loads embedded images with PIL and re-saves them
as PNG data URIs (``ImageRef.from_pil``), so groundtruth uris carry
PIL's encoder output, not the source bytes. PIL's PNG save is
deterministic and replicable:

- every scanline uses the Sub filter (type 1);
- one zlib stream with level 6, memLevel 8, strategy Z_RLE, and a
  window sized to the raw stream (wbits = ceil(log2(len))), bounded to
  [9, 15] - verified byte-identical against the shipped groundtruth
  (tests/data/odf/groundtruth/text_document_03.odt.html data uris).
"""

from __future__ import annotations

import struct
import zlib


def _crc_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png_like_pil(px) -> bytes:
    """(H, W, C) uint8 numpy array -> PNG bytes matching PIL's save."""
    import numpy as np

    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = px.reshape(h, w * c).astype(np.uint8)
    # Sub filter on every row: cur[i] - cur[i - bpp]
    shifted = np.zeros_like(flat)
    shifted[:, c:] = flat[:, :-c]
    filtered = (flat.astype(np.int16) - shifted.astype(np.int16)) & 0xFF
    raw = b"".join(b"\x01" + r.astype(np.uint8).tobytes()
                   for r in filtered)
    wbits = 9
    while (1 << wbits) < len(raw) and wbits < 15:
        wbits += 1
    co = zlib.compressobj(6, zlib.DEFLATED, wbits, 8, zlib.Z_RLE)
    comp = co.compress(raw) + co.flush()
    out = [b"\x89PNG\r\n\x1a\n", _crc_chunk(b"IHDR", ihdr)]
    # PIL emits IDAT in 8 KiB chunks (ImageFile._save buffer size)
    for i in range(0, len(comp), 8192):
        out.append(_crc_chunk(b"IDAT", comp[i:i + 8192]))
    out.append(_crc_chunk(b"IEND", b""))
    return b"".join(out)


def reencode_png_like_pil(data: bytes):
    """Source PNG bytes -> PIL-round-trip PNG bytes, or None when the
    source cannot be pixel-decoded (non-PNG, interlaced, damaged)."""
    from .multimodal import decode_png_pixels

    px = decode_png_pixels(data)
    if px is None:
        return None
    return encode_png_like_pil(px)
