"""Pure-Python Snappy block codec + xerial stream framing.

The reference produces to Kafka with ``compression.type=snappy``
(`/root/reference/internal/integrations/kafka/repository.go:54`); no snappy
library is importable in this sandbox, so the codec is implemented here from
the PUBLIC format documents:

- raw block format: google/snappy ``format_description.txt`` — a uvarint
  uncompressed-length preamble followed by literal / copy elements (tag low
  2 bits select the element, copies carry 1/2/4-byte little-endian offsets);
- stream framing: the xerial snappy-java ``SnappyOutputStream`` header
  (``\\x82SNAPPY\\x00`` + version/compat ints, then big-endian
  length-prefixed compressed blocks) — the wrapper the Apache Kafka java
  client and librdkafka put INSIDE snappy record batches, which is why a
  Kafka consumer cannot decode bare raw-snappy batches.

Nothing here derives from any closed implementation. The compressor is a
greedy hash-table LZ matcher (the format document's suggested strategy);
any output it produces is valid snappy, and the decompressor accepts any
conformant stream, so round-trips against other implementations work in
both directions.
"""

from __future__ import annotations

__all__ = [
    "compress_block",
    "decompress_block",
    "xerial_compress",
    "xerial_decompress",
]

# xerial SnappyOutputStream header: magic, version=1, compat=1
XERIAL_MAGIC = b"\x82SNAPPY\x00"
XERIAL_HEADER = XERIAL_MAGIC + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
_XERIAL_BLOCK = 32 * 1024  # SnappyOutputStream default block size

# the reference implementation compresses input in 64 KiB fragments, which
# also bounds every match offset to the 2-byte-copy range
_FRAGMENT = 65536


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("uvarint too long for a snappy length")


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk) - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < 1 << 24:
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += chunk


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """One copy element, 4 <= length <= 64, offset <= 65535."""
    if 4 <= length <= 11 and offset < 2048:
        out.append(0x01 | ((length - 4) << 2) | ((offset >> 8) << 5))
        out.append(offset & 0xFF)
    else:
        out.append(0x02 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")


def compress_block(data: bytes) -> bytes:
    """``data`` -> one raw snappy block (preamble + elements)."""
    out = bytearray(_uvarint(len(data)))
    for frag in range(0, len(data), _FRAGMENT):
        _compress_fragment(data, frag, min(frag + _FRAGMENT, len(data)), out)
    return bytes(out)


def _compress_fragment(
    data: bytes, base: int, end: int, out: bytearray
) -> None:
    table: dict[bytes, int] = {}
    pos = base
    lit_start = base
    while pos + 4 <= end:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None:
            pos += 1
            continue
        offset = pos - cand
        # key equality already proves a 4-byte match; extend it (the source
        # may overlap the target — legal LZ, handled by the byte-wise
        # decompressor copy)
        mlen = 4
        while pos + mlen < end and data[cand + mlen] == data[pos + mlen]:
            mlen += 1
        if lit_start < pos:
            _emit_literal(out, data[lit_start:pos])
        remaining = mlen
        while remaining > 68:
            _emit_copy(out, offset, 64)
            remaining -= 64
        if remaining > 64:
            # leave >= 4 for the final element (a copy shorter than 4
            # cannot be encoded)
            _emit_copy(out, offset, remaining - 4)
            remaining = 4
        _emit_copy(out, offset, remaining)
        pos += mlen
        lit_start = pos
    if lit_start < end:
        _emit_literal(out, data[lit_start:end])


def decompress_block(buf: bytes) -> bytes:
    """One raw snappy block -> original bytes (strict: bad offsets, truncated
    elements, and length mismatches all raise)."""
    expected, pos = _read_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nbytes = ln - 60
                ln = int.from_bytes(buf[pos : pos + nbytes], "little") + 1
                pos += nbytes
            if pos + ln > n:
                raise ValueError("snappy literal runs past the block")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(f"snappy copy offset {off} out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-wise, the format's RLE idiom
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(
            f"snappy length mismatch: preamble {expected}, got {len(out)}"
        )
    return bytes(out)


def xerial_compress(data: bytes, block_size: int = _XERIAL_BLOCK) -> bytes:
    """``data`` -> xerial-framed snappy stream (header + BE-length-prefixed
    raw blocks), the variant Kafka clients put inside record batches."""
    out = bytearray(XERIAL_HEADER)
    for i in range(0, len(data), block_size):
        blk = compress_block(data[i : i + block_size])
        out += len(blk).to_bytes(4, "big")
        out += blk
    return bytes(out)


def xerial_decompress(buf: bytes) -> bytes:
    """Xerial-framed stream -> original bytes. Bare raw blocks (no header)
    are accepted too — Kafka consumers detect the header the same way, since
    old producers wrote unframed snappy."""
    if not buf.startswith(XERIAL_MAGIC):
        return decompress_block(buf)
    pos = len(XERIAL_HEADER)
    out = bytearray()
    n = len(buf)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated xerial block length")
        bl = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
        if pos + bl > n:
            raise ValueError("truncated xerial block")
        out += decompress_block(buf[pos : pos + bl])
        pos += bl
    return bytes(out)
