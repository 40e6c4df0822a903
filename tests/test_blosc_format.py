"""Hand-assembled blosc1 chunks exercising split-decision paths that
real c-blosc produces but our compress() does not (ADVICE r4 medium):

* small buffers (blocksize/typesize < MIN_BUFFERSIZE=128) written UNSPLIT
  with header flag 0x10 set — the common case for OpenVDB's
  mask-compressed value buffers of partially-active leaves,
* the same unsplit layout WITHOUT 0x10 (pre-1.11 writers never set it;
  the decoder must infer no-split from the MIN_BUFFERSIZE floor),
* a partial trailing (leftover) block, which c-blosc never splits even
  when the full blocks are split.
"""

import struct

import numpy as np
import pytest

from vpt_tpu.scene import blosc


def _shuffle(raw: bytes, typesize: int) -> bytes:
    a = np.frombuffer(raw, np.uint8)
    return a.reshape(-1, typesize).T.tobytes()


def _chunk(nbytes, blocksize, flags, typesize, blocks):
    """blocks = list of lists of streams (verbatim payloads)."""
    header = bytearray(16)
    header[0], header[1], header[2], header[3] = 2, 1, flags, typesize
    body = bytearray()
    bstarts = []
    base = 16 + 4 * len(blocks)
    for streams in blocks:
        bstarts.append(base + len(body))
        for s in streams:
            body += struct.pack("<i", len(s)) + s  # verbatim (cbytes==size)
    chunk = bytes(header) + struct.pack(f"<{len(blocks)}i", *bstarts) + bytes(body)
    chunk = bytearray(chunk)
    struct.pack_into("<III", chunk, 4, nbytes, blocksize, len(chunk))
    return bytes(chunk)


LZ4F = blosc.CODEC_LZ4 << 5
SHUF = 0x1
DONT_SPLIT = 0x10


def test_small_buffer_unsplit_with_flag():
    # 256-byte f32 buffer: blocksize/typesize = 64 < 128 -> c-blosc writes
    # ONE stream per block and sets 0x10.
    raw = np.arange(64, dtype=np.float32).tobytes()
    chunk = _chunk(256, 256, SHUF | DONT_SPLIT | LZ4F, 4,
                   [[_shuffle(raw, 4)]])
    assert blosc.decompress(chunk) == raw


def test_small_buffer_unsplit_old_writer_without_flag():
    # Pre-1.11 writers never set 0x10; the decoder must infer no-split from
    # blocksize/typesize < MIN_BUFFERSIZE.
    raw = np.arange(64, dtype=np.float32).tobytes()
    chunk = _chunk(256, 256, SHUF | LZ4F, 4, [[_shuffle(raw, 4)]])
    assert blosc.decompress(chunk) == raw


def test_split_blocks_with_unsplit_leftover():
    # Two full split blocks + a partial trailing block stored as ONE stream.
    typesize, blocksize = 4, 2048
    rng = np.random.default_rng(3)
    full_a = rng.bytes(blocksize)
    full_b = rng.bytes(blocksize)
    tail = rng.bytes(500)

    def split_streams(raw):
        sh = _shuffle(raw, typesize)
        ne = len(raw) // typesize
        return [sh[i * ne:(i + 1) * ne] for i in range(typesize)]

    chunk = _chunk(
        2 * blocksize + 500, blocksize, SHUF | LZ4F, typesize,
        [split_streams(full_a), split_streams(full_b), [_shuffle(tail, 4)]],
    )
    assert blosc.decompress(chunk) == full_a + full_b + tail


def test_compress_sets_dont_split_for_small_buffers():
    raw = np.arange(64, dtype=np.float32).tobytes()  # 256 bytes
    chunk = blosc.compress(raw, typesize=4)
    assert chunk[2] & DONT_SPLIT  # flags record the no-split decision
    assert blosc.decompress(chunk) == raw
    # Large buffers split and leave the flag clear.
    big = np.arange(65536, dtype=np.float32).tobytes()
    chunk = blosc.compress(big, typesize=4)
    assert not (chunk[2] & DONT_SPLIT)
    assert blosc.decompress(chunk) == big


def test_compress_never_splits_leftover_block():
    # 64KiB block + 500-byte leftover: decoding requires the leftover to be
    # a single stream regardless of the chunk-level split decision.
    rng = np.random.default_rng(5)
    data = rng.bytes((1 << 16) + 500)
    chunk = blosc.compress(data, typesize=4, blocksize=1 << 16)
    assert blosc.decompress(chunk) == data
