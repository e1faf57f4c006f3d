"""Pure-Python snappy decoders for the file reader's codec switch.

The reference's unstructured-storage reader decodes a codec family keyed by
a config string (``UnstructuredStorageReaderUtil.java:117-213``), including
``hadoop-snappy`` (Hadoop's BlockCompressorStream container) and
``framing-snappy`` (the snappy framing format). No Spark/Hadoop codec for
either ships in this environment and the python-snappy wheel is not
installed, so this module implements the two container formats AND the raw
snappy block format from the public format descriptions:

  * raw snappy:      google/snappy format_description.txt (varint preamble,
                     literal/copy tagged elements, overlapping copies);
  * framing-snappy:  google/snappy framing_format.txt (stream identifier,
                     per-chunk masked CRC32C, compressed/uncompressed/
                     padding/skippable chunk types);
  * hadoop-snappy:   Hadoop BlockCompressorStream layout (big-endian
                     uncompressed-block length, then one or more big-endian
                     length-prefixed raw-snappy chunks per block).

Decode runs executor-side inside the whole-file reader pass (the same place
gzip/bzip2/deflate decode for >_MAX_UNION_FILES inputs), so throughput is
bounded by the Python byte loop — fine for the many-small-objects shape
these containers are used for; a cluster with the native codec on the
classpath would read the same files through Spark's own codec instead.

The writer half (`framing_snappy_compress` / `hadoop_snappy_compress`)
emits literal-only snappy — a fully compliant encoding every decoder must
accept (compression is optional in the format, correctness is not) — and
exists for fixtures and round-trip tests, not as a production compressor.
"""

from __future__ import annotations

import struct

_MASK_DELTA = 0xA282EAD8
_CRC32C_POLY = 0x82F63B78
_crc32c_table: list[int] | None = None


def _crc32c(data: bytes) -> int:
    global _crc32c_table
    if _crc32c_table is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
            tbl.append(c)
        _crc32c_table = tbl
    crc = 0xFFFFFFFF
    tbl = _crc32c_table
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block decode (format_description.txt)."""
    # varint-encoded uncompressed length
    pos, shift, expect = 0, 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated preamble")
        b = data[pos]
        pos += 1
        expect |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 31:
            raise ValueError("snappy: preamble varint too long")
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63: length-1 in the next 1..4 LE bytes
                extra = length - 59
                length = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            length += 1
            if pos + length > n:
                raise ValueError("snappy: literal overruns input")
            out += data[pos:pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - offset
        for i in range(length):  # copies may overlap: byte-at-a-time
            out.append(out[start + i])
    if len(out) != expect:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {expect}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Literal-only raw snappy (compliant; no back-references emitted)."""
    out = bytearray()
    # varint length
    v = len(data)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 65536]
        length = len(chunk) - 1
        if length < 60:
            out.append(length << 2)
        elif length < 256:
            out.append(60 << 2)
            out.append(length)
        else:
            out.append(61 << 2)
            out += length.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def framing_snappy_decompress(data: bytes) -> bytes:
    """Snappy framing format (framing_format.txt): chunked stream with
    per-chunk masked CRC32C over the UNCOMPRESSED payload."""
    if not data.startswith(_STREAM_ID):
        raise ValueError("framing-snappy: missing sNaPpY stream identifier")
    pos, n = 0, len(data)
    out = bytearray()
    while pos < n:
        if pos + 4 > n:
            raise ValueError("framing-snappy: truncated chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + clen > n:
            raise ValueError("framing-snappy: truncated chunk body")
        body = data[pos:pos + clen]
        pos += clen
        if ctype == 0xFF:  # stream identifier (may legally repeat)
            if body != b"sNaPpY":
                raise ValueError("framing-snappy: bad stream identifier")
        elif ctype == 0x00:  # compressed data
            crc = int.from_bytes(body[:4], "little")
            chunk = snappy_decompress(body[4:])
            if _masked_crc(chunk) != crc:
                raise ValueError("framing-snappy: CRC mismatch")
            out += chunk
        elif ctype == 0x01:  # uncompressed data
            crc = int.from_bytes(body[:4], "little")
            chunk = body[4:]
            if _masked_crc(chunk) != crc:
                raise ValueError("framing-snappy: CRC mismatch")
            out += chunk
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / reserved skippable
        else:  # 0x02..0x7f reserved unskippable
            raise ValueError(
                f"framing-snappy: reserved unskippable chunk 0x{ctype:02x}"
            )
    return bytes(out)


def framing_snappy_compress(data: bytes, chunk: int = 65536) -> bytes:
    out = bytearray(_STREAM_ID)
    for pos in range(0, len(data), chunk) or [0]:
        piece = data[pos:pos + chunk]
        comp = snappy_compress(piece)
        body = _masked_crc(piece).to_bytes(4, "little") + comp
        out.append(0x00)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def hadoop_snappy_decompress(data: bytes) -> bytes:
    """Hadoop BlockCompressorStream container: per block, a big-endian
    uncompressed length followed by big-endian length-prefixed raw-snappy
    chunks until the block is complete."""
    pos, n = 0, len(data)
    out = bytearray()
    while pos < n:
        if pos + 4 > n:
            raise ValueError("hadoop-snappy: truncated block header")
        (block_len,) = struct.unpack(">I", data[pos:pos + 4])
        pos += 4
        got = 0
        while got < block_len:
            if pos + 4 > n:
                raise ValueError("hadoop-snappy: truncated chunk header")
            (clen,) = struct.unpack(">I", data[pos:pos + 4])
            pos += 4
            if pos + clen > n:
                raise ValueError("hadoop-snappy: truncated chunk body")
            chunk = snappy_decompress(data[pos:pos + clen])
            pos += clen
            got += len(chunk)
            out += chunk
        if got != block_len:
            raise ValueError(
                f"hadoop-snappy: block decoded {got}, header said {block_len}"
            )
    return bytes(out)


def hadoop_snappy_compress(data: bytes, block: int = 65536) -> bytes:
    out = bytearray()
    for pos in range(0, len(data), block) or [0]:
        piece = data[pos:pos + block]
        out += struct.pack(">I", len(piece))
        if piece:  # a 0-length block carries no chunks (decoder reads none)
            comp = snappy_compress(piece)
            out += struct.pack(">I", len(comp))
            out += comp
    return bytes(out)
