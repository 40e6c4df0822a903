"""OpenVDB (.vdb) ingestion (reference: PathTracer.cpp:1347-1516).

No .vdb assets ship with the reference snapshot or this environment, so the
parser is validated by round-trip against the module's own spec-conformant
writer (224-layout, zip + raw buffers, multi-node topologies) plus
structural checks of the binary layout (magic, version, offsets)."""

import struct

import numpy as np
import pytest

from vpt_tpu.scene.vdb import load_grid, procedural_cloud
from vpt_tpu.scene.vdb_reader import MAGIC, VdbError, read_vdb, write_vdb


def _roundtrip(tmp_path, values, name="density", compress=True, voxel=0.5):
    p = str(tmp_path / "g.vdb")
    write_vdb(p, values, grid_name=name, voxel_size=voxel, compress=compress)
    return p, read_vdb(p)


def test_roundtrip_small_cloud(tmp_path):
    vals = procedural_cloud((24, 20, 28), coverage=0.5, seed=1)
    p, g = _roundtrip(tmp_path, vals)
    assert g.name == "density"
    assert np.allclose(g.voxel_size, 0.5)
    # The dense output covers the leaf-aligned bbox of NONZERO leaves —
    # re-embed it at origin_ijk and compare against the source.
    d, h, w = vals.shape
    ox, oy, oz = (int(v) for v in g.origin_ijk)
    rebuilt = np.zeros((max(d, oz + g.values.shape[0]),
                        max(h, oy + g.values.shape[1]),
                        max(w, ox + g.values.shape[2])), np.float32)
    rebuilt[oz : oz + g.values.shape[0], oy : oy + g.values.shape[1],
            ox : ox + g.values.shape[2]] = g.values
    np.testing.assert_allclose(rebuilt[:d, :h, :w], vals, atol=1e-6)
    assert g.values.max() == pytest.approx(vals.max(), abs=1e-6)


def test_active_value_tiles_densify(tmp_path):
    # Constant 8^3 regions written as level-1 active value TILES (the form
    # OpenVDB emits for uniform fog interiors) must load at their value,
    # not at background (ADVICE r2: tiles were silently dropped).
    vals = np.zeros((24, 24, 24), np.float32)
    vals[0:8, 0:8, 0:8] = 0.7  # uniform block -> becomes a tile
    vals[8:16, 8:16, 8:16] = np.random.default_rng(0).uniform(
        0.1, 1.0, (8, 8, 8)).astype(np.float32)  # non-uniform -> stays a leaf
    vals[16:24, 0:8, 0:8] = 0.3  # second tile
    p = str(tmp_path / "tiles.vdb")
    write_vdb(p, vals, tile_uniform_leaves=True)
    g = read_vdb(p)
    ox, oy, oz = (int(v) for v in g.origin_ijk)
    rebuilt = np.zeros_like(vals)
    rebuilt[oz : oz + g.values.shape[0], oy : oy + g.values.shape[1],
            ox : ox + g.values.shape[2]] = g.values
    np.testing.assert_allclose(rebuilt, vals, atol=1e-6)


def test_roundtrip_uncompressed_and_multi_l2(tmp_path):
    # Two far-apart blobs force multiple level-2 (4096-span) root children.
    vals = np.zeros((16, 16, 4100), np.float32)
    vals[2:10, 3:12, 5:60] = 1.5
    vals[4:9, 2:9, 4096:4100] = 2.5
    p, g = _roundtrip(tmp_path, vals, compress=False)
    assert g.values.max() == pytest.approx(2.5)
    assert (g.values > 0).sum() == (vals > 0).sum()
    got = g.values[: vals.shape[0], : vals.shape[1], : vals.shape[2]]
    np.testing.assert_allclose(got, vals, atol=1e-6)


def test_load_grid_dispatches_vdb(tmp_path):
    vals = np.zeros((8, 8, 8), np.float32)
    vals[2:6, 2:6, 2:6] = 3.0
    p = str(tmp_path / "d.vdb")
    write_vdb(p, vals)
    out = load_grid(p)
    np.testing.assert_allclose(out[:8, :8, :8], vals, atol=1e-6)


def test_header_layout(tmp_path):
    p = str(tmp_path / "h.vdb")
    write_vdb(p, np.ones((8, 8, 8), np.float32))
    raw = open(p, "rb").read()
    magic, version = struct.unpack_from("<qI", raw, 0)
    assert magic == MAGIC and version == 224


def test_errors_are_clear(tmp_path):
    p = str(tmp_path / "bad.vdb")
    open(p, "wb").write(b"\x00" * 64)
    with pytest.raises(VdbError, match="magic"):
        read_vdb(p)
    good = str(tmp_path / "ok.vdb")
    write_vdb(good, np.ones((8, 8, 8), np.float32), grid_name="temperature")
    with pytest.raises(VdbError, match="not in file"):
        read_vdb(good, grid_name="density")
    g = read_vdb(good, grid_name="temperature")
    assert g.name == "temperature"


def test_roundtrip_blosc(tmp_path):
    """Blosc1-LZ4 value buffers (OpenVDB's own default codec) decode: a
    write_vdb(compress="blosc") file must read back exactly, through the
    same envelope + chunk layout OpenVDB emits (io/Compression.cc)."""
    vals = procedural_cloud((24, 20, 28), coverage=0.5, seed=4)
    p, g = _roundtrip(tmp_path, vals, compress="blosc")
    d, h, w = vals.shape
    ox, oy, oz = (int(v) for v in g.origin_ijk)
    rebuilt = np.zeros((max(d, oz + g.values.shape[0]),
                        max(h, oy + g.values.shape[1]),
                        max(w, ox + g.values.shape[2])), np.float32)
    rebuilt[oz : oz + g.values.shape[0], oy : oy + g.values.shape[1],
            ox : ox + g.values.shape[2]] = g.values
    np.testing.assert_allclose(rebuilt[:d, :h, :w], vals, atol=1e-6)


def test_blosc_codec_units():
    """Blosc chunk container unit checks: memcpyed chunks, shuffled
    verbatim streams, LZ4 streams, and the pure-Python fallback."""
    import struct

    from vpt_tpu.scene import blosc

    rng = np.random.default_rng(2)
    # Compressible data round trip (exercises LZ4 + byte shuffle)
    data = (np.sin(np.arange(30000, dtype=np.float32) * 0.01) * 50).tobytes()
    chunk = blosc.compress(data, typesize=4)
    assert blosc.decompress(chunk) == data
    if blosc._load() is not None:
        assert len(chunk) < len(data)  # LZ4 really compressed
    # Incompressible -> verbatim streams still round trip
    rnd = rng.bytes(8192)
    assert blosc.decompress(blosc.compress(rnd, typesize=4)) == rnd
    # Pure-Python LZ4 fallback decodes the same chunks
    orig = blosc._load
    blosc._load = lambda: None
    try:
        assert blosc.decompress(chunk) == data
        assert blosc.decompress(blosc.compress(rnd, typesize=4)) == rnd
    finally:
        blosc._load = orig
    # Raw memcpyed chunk (flags bit 1)
    hdr = bytearray(16)
    hdr[0], hdr[1], hdr[2], hdr[3] = 2, 1, 0x2, 4
    struct.pack_into("<III", hdr, 4, len(rnd), len(rnd), 16 + len(rnd))
    assert blosc.decompress(bytes(hdr) + rnd) == rnd
    # Truncated chunk raises a clear error
    with pytest.raises(blosc.BloscError):
        blosc.decompress(chunk[:10])
