"""Reader-only OpenVDB format tests (VERDICT r4 #7: break the write_vdb
round-trip circle).

`_assemble()` below is an INDEPENDENT second writer: it lays the file out
byte-by-byte from the openvdb/io layout documented in vdb_reader.py,
sharing no code with write_vdb, and deliberately uses features write_vdb
never produces: COMPRESS_ACTIVE_MASK actives-only value storage (metadata
codes 0 and 4 with a selection mask), root-level L2 value tiles in the
topology, half-float buffers, and zero-length compressed arrays.  A
reader/writer bug pair that cancels in round-trip tests fails here.
"""

import struct
import zlib

import numpy as np
import pytest

from vpt_tpu.scene.vdb_reader import (
    COMPRESS_ACTIVE_MASK,
    COMPRESS_ZIP,
    L0_DIM,
    L0_N,
    L1_N,
    L2_N,
    MAGIC,
    VdbError,
    read_vdb,
    write_vdb,
)


def _mask_bytes(bits: np.ndarray) -> bytes:
    return np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _zip_array(vals: np.ndarray, dtype) -> bytes:
    raw = np.asarray(vals, dtype).tobytes()
    comp = zlib.compress(raw)
    return struct.pack("<q", len(comp)) + comp


def _assemble(
    leaf_active: np.ndarray,   # (512,) bool — active voxels of the one leaf
    leaf_vals: np.ndarray,     # (512,) float — values at active voxels
    background: float = 0.125,
    inactive_val: float | None = None,   # code 4 with selection if set
    selection: np.ndarray | None = None,
    half: bool = False,
    l2_tile: tuple[tuple[int, int, int], float] | None = None,
    file_version: int = 224,
) -> bytes:
    """One density grid: one L2 node at (0,0,0), one L1 child at slot 0,
    one leaf at slot 0.  Values zip-compressed, actives-only
    (COMPRESS_ACTIVE_MASK), metadata code 0 (or 4 with `inactive_val`)."""
    dtype = np.dtype(np.float16 if half else np.float32)
    compression = COMPRESS_ZIP | COMPRESS_ACTIVE_MASK

    def value(x):
        return np.asarray(x, dtype).tobytes()

    out = bytearray()
    out += struct.pack("<q", MAGIC)
    out += struct.pack("<I", file_version)
    out += struct.pack("<II", 10, 0)          # library version
    out += b"\x01"                            # has grid offsets
    out += struct.pack("<I", compression)
    out += b"f" * 36                          # uuid
    out += struct.pack("<I", 0)               # file metadata count
    out += struct.pack("<I", 1)               # grid count

    gtype = "Tree_float_5_4_3" + ("_HalfFloat" if half else "")
    out += _string("density")
    out += _string(gtype)
    out += _string("")                        # instance parent
    offsets_at = len(out)
    out += struct.pack("<qqq", 0, 0, 0)

    grid_pos = len(out)
    if file_version >= 222:
        out += struct.pack("<I", compression)  # per-grid compression
    out += struct.pack("<I", 0)               # grid metadata count
    # UniformScaleMap: 5 Vec3d (scale, voxelSize, scaleInv, invScaleSqr,
    # invTwiceScale)
    out += _string("UniformScaleMap")
    vs = 0.5
    out += struct.pack(
        "<15d", *([vs] * 6 + [2.0] * 3 + [4.0] * 3 + [1.0] * 3)
    )

    # ---- tree topology
    out += struct.pack("<I", 1)               # buffer count
    out += value(background)
    out += struct.pack("<II", 0, 1)           # root tiles, root children
    out += struct.pack("<3i", 0, 0, 0)        # L2 origin

    child2 = np.zeros(L2_N, bool)
    child2[0] = True                          # one L1 child at slot 0
    value2 = np.zeros(L2_N, bool)
    vals2_stored = np.zeros(0, np.float32)
    if l2_tile is not None:
        (tx, ty, tz), tval = l2_tile
        # L2 slot indices are x-major: ((x<<5)+y<<5)+z over 32^3 at 128-span
        slot = (((tx // 128) << 5 | (ty // 128)) << 5) | (tz // 128)
        value2[slot] = True
        vals2_stored = np.array([tval], np.float32)
    def _internal_vals(stored_actives, value_mask, fill=0.0):
        # >= 222: metadata code 0 (actives-only); pre-222 archives have no
        # codes and store every value verbatim.
        b = bytearray()
        if file_version >= 222:
            b += struct.pack("<b", 0)
            b += _zip_array(stored_actives, dtype)
        else:
            full = np.full(value_mask.shape[0], fill, np.float32)
            full[value_mask] = stored_actives
            b += _zip_array(full, dtype)
        return bytes(b)

    out += _mask_bytes(child2)
    out += _mask_bytes(value2)
    out += _internal_vals(vals2_stored, value2, background)

    child1 = np.zeros(L1_N, bool)
    child1[0] = True                          # one leaf at slot 0
    value1 = np.zeros(L1_N, bool)
    out += _mask_bytes(child1)
    out += _mask_bytes(value1)
    out += _internal_vals(np.zeros(0, np.float32), value1, background)

    out += _mask_bytes(leaf_active)           # leaf topology mask

    # ---- leaf buffers: mask again, then values
    out += _mask_bytes(leaf_active)
    if file_version < 222:
        out += struct.pack("<3i", 0, 0, 0)    # leaf origin (pre-222)
        out += struct.pack("<b", 1)           # buffer count (pre-222)
        # pre-222 archives have no per-array metadata codes: all values
        out += _zip_array(
            np.where(leaf_active, leaf_vals, background), dtype
        )
    elif inactive_val is not None:
        out += struct.pack("<b", 4)           # MASK_AND_ONE_INACTIVE_VAL
        out += value(inactive_val)
        out += _mask_bytes(selection)
        out += _zip_array(leaf_vals[leaf_active], dtype)
    else:
        out += struct.pack("<b", 0)           # actives-only, inactive=bg
        out += _zip_array(leaf_vals[leaf_active], dtype)

    end = len(out)
    struct.pack_into("<qqq", out, offsets_at, grid_pos, grid_pos, end)
    return bytes(out)


def _leaf_pattern():
    rng = np.random.default_rng(7)
    active = np.zeros(L0_N, bool)
    active[rng.choice(L0_N, 100, replace=False)] = True
    vals = np.zeros(L0_N, np.float32)
    vals[active] = rng.uniform(0.25, 2.0, 100).astype(np.float32)
    return active, vals


def _check(g, active, vals, background, atol=1e-6):
    # leaf (x,y,z)-order values land at dense[z, y, x]
    blk = np.where(active, vals, background).reshape(L0_DIM, L0_DIM, L0_DIM)
    got = g.values[:L0_DIM, :L0_DIM, :L0_DIM]
    np.testing.assert_allclose(got, np.transpose(blk, (2, 1, 0)), atol=atol)


def test_fixture_actives_only_code0(tmp_path):
    active, vals = _leaf_pattern()
    p = tmp_path / "f.vdb"
    p.write_bytes(_assemble(active, vals))
    g = read_vdb(str(p))
    assert g.name == "density"
    assert g.background == pytest.approx(0.125)
    assert np.allclose(g.voxel_size, 0.5)
    _check(g, active, vals, 0.125)


def test_fixture_selection_mask_code4(tmp_path):
    active, vals = _leaf_pattern()
    selection = ~active & (np.arange(L0_N) % 3 == 0)
    p = tmp_path / "f.vdb"
    p.write_bytes(
        _assemble(active, vals, inactive_val=-0.7, selection=selection)
    )
    g = read_vdb(str(p))
    dense = g.values[:L0_DIM, :L0_DIM, :L0_DIM]
    expect = np.where(active, vals, np.where(selection, 0.125, -0.7))
    expect = np.transpose(
        expect.reshape(L0_DIM, L0_DIM, L0_DIM), (2, 1, 0)
    )
    np.testing.assert_allclose(dense, expect, atol=1e-6)


def test_fixture_half_float_buffers(tmp_path):
    active, vals = _leaf_pattern()
    p = tmp_path / "f.vdb"
    p.write_bytes(_assemble(active, vals, half=True))
    g = read_vdb(str(p))
    _check(g, active, vals.astype(np.float16).astype(np.float32), 0.125,
           atol=1e-3)


def test_fixture_l2_value_tile(tmp_path):
    active, vals = _leaf_pattern()
    p = tmp_path / "f.vdb"
    p.write_bytes(_assemble(active, vals, l2_tile=((128, 0, 0), 0.9)))
    g = read_vdb(str(p))
    _check(g, active, vals, 0.125)
    # the 128-span tile at x=128 splats at its value
    assert g.values[0, 0, 128] == pytest.approx(0.9)
    assert g.values[127, 127, 255] == pytest.approx(0.9)


def test_fixture_pre222_leaf_origin_variant(tmp_path):
    active, vals = _leaf_pattern()
    p = tmp_path / "f.vdb"
    p.write_bytes(_assemble(active, vals, file_version=221))
    g = read_vdb(str(p))
    _check(g, active, vals, 0.125)


def test_half_roundtrip_through_writer(tmp_path):
    vals = np.zeros((16, 16, 16), np.float32)
    vals[2:14, 3:13, 4:12] = np.linspace(
        0.1, 1.9, 12 * 10 * 8, dtype=np.float32
    ).reshape(12, 10, 8)
    p = str(tmp_path / "h.vdb")
    write_vdb(p, vals, save_float_as_half=True)
    g = read_vdb(p)
    got = np.zeros_like(vals)
    oz, oy, ox = int(g.origin_ijk[2]), int(g.origin_ijk[1]), int(g.origin_ijk[0])
    got[oz:oz + g.values.shape[0], oy:oy + g.values.shape[1],
        ox:ox + g.values.shape[2]] = g.values
    np.testing.assert_allclose(got, vals.astype(np.float16), atol=1e-3)


@pytest.mark.slow
def test_truncation_fuzz(tmp_path):
    """Every truncation of a valid file raises VdbError — never a raw
    struct/numpy/zlib error, never a hang."""
    active, vals = _leaf_pattern()
    fixtures = [_assemble(active, vals)]
    p = str(tmp_path / "w.vdb")
    write_vdb(p, np.ones((12, 12, 12), np.float32))
    fixtures.append(open(p, "rb").read())
    for data in fixtures:
        path = tmp_path / "t.vdb"
        for cut in list(range(0, 128)) + list(range(128, len(data), 61)):
            path.write_bytes(data[:cut])
            with pytest.raises(VdbError):
                read_vdb(str(path))


def test_corrupt_counts_raise_not_hang(tmp_path):
    active, vals = _leaf_pattern()
    data = bytearray(_assemble(active, vals))
    # Blow up the root tile count field (offset: find it via a rebuilt
    # prefix is brittle; instead corrupt every u32 position in the first
    # 600 bytes and require a clean error or a successful parse).
    for off in range(60, 600, 7):
        bad = bytearray(data)
        struct.pack_into("<I", bad, off, 0x7FFFFFFF)
        path = tmp_path / "c.vdb"
        path.write_bytes(bytes(bad))
        try:
            read_vdb(str(path))
        except VdbError:
            pass
