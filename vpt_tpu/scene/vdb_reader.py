"""Pure-Python OpenVDB (.vdb) reader → dense (D, H, W) float32 bricks.

The reference ingests OpenVDB through the native openvdb/NanoVDB libraries
(/root/reference/PathTracer/PathTracer.cpp:1347-1516); neither ships in
this environment, so this module parses the file format directly.

Supported subset (the common "cloud/smoke float grid" case):
* file format versions 220-224 (OpenVDB 3.x-10.x writers),
* float grids with the standard 5-4-3 tree (``Tree_float_5_4_3``),
* uncompressed or ZIP(zlib) value buffers — BLOSC-compressed files raise a
  clear error naming the option to re-export without blosc,
* non-instanced grids with grid offsets (every normal .vdb file).

The output is a dense voxel array over the grid's active bounding box plus
``(origin_ijk, voxel_size)`` so callers can place it in world space.  A
matching minimal writer (`write_vdb`) exists for round-trip tests; this
environment bundles no .vdb assets to validate against, so files produced
by exotic writers may still hit unsupported-feature errors — each raises
with the offending feature named.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

MAGIC = 0x56444220  # " BDV" little-endian, per openvdb/io/Archive
# Compression bit flags (openvdb::io::COMPRESS_*)
COMPRESS_NONE = 0
COMPRESS_ZIP = 1
COMPRESS_ACTIVE_MASK = 2
COMPRESS_BLOSC = 4

# Node-value compression metadata codes (openvdb::io::readCompressedValues)
NO_MASK_OR_INACTIVE_VALS = 0
NO_MASK_AND_MINUS_BG = 1
NO_MASK_AND_ONE_INACTIVE_VAL = 2
MASK_AND_NO_INACTIVE_VALS = 3
MASK_AND_ONE_INACTIVE_VAL = 4
MASK_AND_TWO_INACTIVE_VALS = 5
NO_MASK_AND_ALL_VALS = 6

# 5-4-3 tree dimensions
L2_LOG2, L1_LOG2, L0_LOG2 = 5, 4, 3  # internal32, internal16, leaf8
L2_DIM, L1_DIM, L0_DIM = 1 << L2_LOG2, 1 << L1_LOG2, 1 << L0_LOG2
L2_N, L1_N, L0_N = L2_DIM ** 3, L1_DIM ** 3, L0_DIM ** 3
# Total voxel span of one level-2 node: 32 * 16 * 8 = 4096
L2_SPAN = L2_DIM * L1_DIM * L0_DIM
L1_SPAN = L1_DIM * L0_DIM


class VdbError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def bytes(self, n):
        b = self.d[self.p : self.p + n]
        if len(b) != n:
            raise VdbError("unexpected end of file")
        self.p += n
        return b

    def u32(self):
        return struct.unpack("<I", self.bytes(4))[0]

    def i32(self):
        return struct.unpack("<i", self.bytes(4))[0]

    def u64(self):
        return struct.unpack("<Q", self.bytes(8))[0]

    def i64(self):
        return struct.unpack("<q", self.bytes(8))[0]

    def f32(self):
        return struct.unpack("<f", self.bytes(4))[0]

    def f64(self):
        return struct.unpack("<d", self.bytes(8))[0]

    def byte(self):
        return self.bytes(1)[0]

    def string(self):
        return self.bytes(self.u32()).decode("utf-8", errors="replace")

    def coord(self):
        return struct.unpack("<3i", self.bytes(12))


def _read_metadata(r: _Reader) -> dict:
    """Name → (typename, raw value bytes); values parsed for common types."""
    meta = {}
    count = r.u32()
    for _ in range(count):
        name = r.string()
        typ = r.string()
        raw = r.bytes(r.u32())
        val: object = raw
        try:
            if typ == "string":
                # value bytes are uint32 length + chars
                (slen,) = struct.unpack("<I", raw[:4])
                val = raw[4 : 4 + slen].decode()
            elif typ in ("int32",):
                (val,) = struct.unpack("<i", raw)
            elif typ in ("int64",):
                (val,) = struct.unpack("<q", raw)
            elif typ == "float":
                (val,) = struct.unpack("<f", raw)
            elif typ == "double":
                (val,) = struct.unpack("<d", raw)
            elif typ == "bool":
                val = raw[0] != 0
            elif typ == "vec3i":
                val = struct.unpack("<3i", raw)
            elif typ == "vec3d":
                val = struct.unpack("<3d", raw)
        except struct.error:
            pass
        meta[name] = (typ, val)
    return meta


def _read_transform(r: _Reader):
    """Returns (map_type, voxel_size (3,), translate (3,))."""
    map_type = r.string()
    if map_type in ("UniformScaleMap", "ScaleMap"):
        sx, sy, sz = r.f64(), r.f64(), r.f64()
        # voxel size + inverse + inverse-squared triples follow
        r.bytes(8 * 6)
        return map_type, np.array([sx, sy, sz]), np.zeros(3)
    if map_type in ("UniformScaleTranslateMap", "ScaleTranslateMap"):
        tx, ty, tz = r.f64(), r.f64(), r.f64()
        sx, sy, sz = r.f64(), r.f64(), r.f64()
        r.bytes(8 * 6)
        return map_type, np.array([sx, sy, sz]), np.array([tx, ty, tz])
    if map_type == "TranslationMap":
        tx, ty, tz = r.f64(), r.f64(), r.f64()
        return map_type, np.ones(3), np.array([tx, ty, tz])
    if map_type == "AffineMap":
        m = np.array([r.f64() for _ in range(16)]).reshape(4, 4)
        return map_type, np.diag(m[:3, :3]).copy(), m[3, :3].copy()
    raise VdbError(f"unsupported transform map type: {map_type}")


def _read_mask(r: _Reader, n_bits: int) -> np.ndarray:
    words = n_bits // 64
    raw = np.frombuffer(r.bytes(words * 8), np.uint64)
    bits = np.unpackbits(raw.view(np.uint8), bitorder="little")
    return bits.astype(bool)


def _read_values(r: _Reader, n_stored: int, compression: int) -> np.ndarray:
    """A compressed/raw array of `n_stored` float32 values."""
    if n_stored == 0:
        return np.zeros(0, np.float32)
    if compression & COMPRESS_BLOSC:
        # OpenVDB's default write path: an Int64-length envelope around one
        # blosc1 chunk (LZ4 codec, byte shuffle) — see vpt_tpu.scene.blosc.
        from vpt_tpu.scene import blosc

        n = r.i64()
        if n <= 0:
            # Stored uncompressed (blosc didn't shrink): -n bytes raw
            return np.frombuffer(r.bytes(-n), np.float32).copy()
        try:
            raw = blosc.decompress(r.bytes(n))
        except blosc.BloscError as e:
            raise VdbError(f"blosc-compressed .vdb: {e}") from e
        return np.frombuffer(raw, np.float32).copy()
    if compression & COMPRESS_ZIP:
        n = r.i64()
        if n <= 0:
            # Writer stored the data uncompressed (didn't shrink): -n bytes raw
            return np.frombuffer(r.bytes(-n), np.float32).copy()
        return np.frombuffer(zlib.decompress(r.bytes(n)), np.float32).copy()
    return np.frombuffer(r.bytes(4 * n_stored), np.float32).copy()


def _read_compressed_values(r: _Reader, n_total: int, value_mask: np.ndarray,
                            compression: int, file_version: int,
                            background: float = 0.0) -> np.ndarray:
    """openvdb::io::readCompressedValues: node value arrays with the optional
    selection mask + inactive-value metadata (file version >= 222).

    Semantics follow openvdb/io/Compression.h: values are mask-compressed
    (only active values stored) exactly when the metadata code is one of the
    MASK_AND_* codes; the selection mask then marks inactive voxels holding
    the SECOND inactive value (inactive2), all other inactive voxels hold
    the first (inactive1).  NO_MASK_* codes store every value verbatim."""
    out = np.zeros(n_total, np.float32)
    meta_code = NO_MASK_AND_ALL_VALS
    if file_version >= 222:
        meta_code = struct.unpack("<b", r.bytes(1))[0]
    inactive1 = background
    if meta_code == NO_MASK_AND_MINUS_BG:
        inactive1 = -background
    if meta_code in (NO_MASK_AND_ONE_INACTIVE_VAL, MASK_AND_ONE_INACTIVE_VAL,
                     MASK_AND_TWO_INACTIVE_VALS):
        inactive1 = r.f32()
    inactive2 = inactive1
    if meta_code == MASK_AND_TWO_INACTIVE_VALS:
        inactive2 = r.f32()

    mask_compressed = meta_code in (MASK_AND_NO_INACTIVE_VALS,
                                    MASK_AND_ONE_INACTIVE_VAL,
                                    MASK_AND_TWO_INACTIVE_VALS)
    selection = np.zeros(n_total, bool)
    if mask_compressed:
        selection = _read_mask(r, n_total)

    n_stored = int(value_mask.sum()) if mask_compressed else n_total
    vals = _read_values(r, n_stored, compression)
    if mask_compressed:
        out[value_mask] = vals
        out[~value_mask & selection] = inactive2
        out[~value_mask & ~selection] = inactive1
    else:
        out[:] = vals[:n_total]
    return out


@dataclass
class VdbGrid:
    name: str
    values: np.ndarray  # (D, H, W) dense over the active bounding box (z, y, x)
    origin_ijk: np.ndarray  # (3,) index-space origin (x, y, z) of values[0,0,0]
    voxel_size: np.ndarray  # (3,)
    translate: np.ndarray  # (3,) world offset
    background: float


def _read_tree(r: _Reader, compression: int, file_version: int):
    """FloatTree 5-4-3: returns ({leaf origin (x,y,z): (512,) values},
    [(origin, span, value)] active tiles, background).

    Active value tiles — constant-value regions without leaves, common in
    fog/cloud exports — are collected at every level: root tiles span a
    whole level-2 node (4096 voxels/side), level-2 tiles span one level-1
    child (128/side), level-1 tiles span one leaf (8/side).  The caller
    splats them into the dense array (ADVICE r2: they were silently
    dropped, loading those regions at background density)."""
    r.u32()  # buffer count (always 1)
    background = r.f32()
    n_tiles = r.u32()
    n_children = r.u32()
    tiles = []  # (origin_xyz, span, value) — active tiles at any level
    for _ in range(n_tiles):
        xyz = r.coord()
        val = r.f32()
        active = r.byte() != 0
        if active:
            tiles.append((xyz, L2_SPAN, val))
    leaves = {}
    leaf_descs = []  # (origin, value_mask) in read order

    for _ in range(n_children):
        origin2 = r.coord()
        # ---- level-2 internal node (32^3) topology
        child2 = _read_mask(r, L2_N)
        value2 = _read_mask(r, L2_N)
        vals2 = _read_compressed_values(r, L2_N, value2, compression,
                                        file_version, background)
        for i2 in np.nonzero(value2 & ~child2)[0]:
            o2 = _offset_to_coord(int(i2), L2_LOG2, L1_LOG2 + L0_LOG2)
            tiles.append((
                (origin2[0] + o2[0], origin2[1] + o2[1], origin2[2] + o2[2]),
                L1_SPAN, float(vals2[i2]),
            ))
        for i2 in np.nonzero(child2)[0]:
            o2 = _offset_to_coord(int(i2), L2_LOG2, L1_LOG2 + L0_LOG2)
            base2 = (origin2[0] + o2[0], origin2[1] + o2[1], origin2[2] + o2[2])
            # ---- level-1 internal node (16^3)
            child1 = _read_mask(r, L1_N)
            value1 = _read_mask(r, L1_N)
            vals1 = _read_compressed_values(r, L1_N, value1, compression,
                                            file_version, background)
            for i1 in np.nonzero(value1 & ~child1)[0]:
                o1 = _offset_to_coord(int(i1), L1_LOG2, L0_LOG2)
                tiles.append((
                    (base2[0] + o1[0], base2[1] + o1[1], base2[2] + o1[2]),
                    L0_DIM, float(vals1[i1]),
                ))
            for i1 in np.nonzero(child1)[0]:
                o1 = _offset_to_coord(int(i1), L1_LOG2, L0_LOG2)
                base1 = (base2[0] + o1[0], base2[1] + o1[1], base2[2] + o1[2])
                # ---- leaf topology: value mask only
                lmask = _read_mask(r, L0_N)
                leaf_descs.append((base1, lmask))

    # ---- leaf buffers (Tree::readBuffers order = topology order)
    for base, lmask in leaf_descs:
        vals = _read_compressed_values(r, L0_N, lmask, compression,
                                       file_version, background)
        leaves[base] = vals
    return leaves, tiles, background


def _offset_to_coord(offset: int, log2dim: int, child_log2: int):
    """Linear offset inside an internal node → (x, y, z) voxel offset."""
    dim = 1 << log2dim
    x = offset >> (2 * log2dim)
    y = (offset >> log2dim) & (dim - 1)
    z = offset & (dim - 1)
    return (x << child_log2, y << child_log2, z << child_log2)


def read_vdb(path: str, grid_name: str | None = None) -> VdbGrid:
    """Parse `path` and densify one float grid (the named one, else the
    first float grid; 'density' preferred)."""
    data = open(path, "rb").read()
    r = _Reader(data)
    if r.i64() != MAGIC:
        raise VdbError("not an OpenVDB file (bad magic)")
    file_version = r.u32()
    if file_version < 220 or file_version > 224:
        raise VdbError(
            f"unsupported OpenVDB file version {file_version} (supported: 220-224)"
        )
    r.u32(), r.u32()  # library major/minor
    has_offsets = r.byte() != 0
    compression = COMPRESS_NONE
    if file_version >= 220:
        compression = r.u32()
    # UUID: 36-char ascii without length prefix
    r.bytes(36)
    _read_metadata(r)  # file-level metadata
    if not has_offsets:
        raise VdbError("delayed-load-less archives without grid offsets unsupported")

    n_grids = r.u32()
    descs = []
    for _ in range(n_grids):
        uname = r.string()
        gtype = r.string()
        pos, blocks_pos, end_pos = r.i64(), r.i64(), r.i64()
        descs.append((uname, gtype, pos, end_pos))
        r.p = end_pos  # descriptors are written back-to-back with bodies

    # pick the grid
    float_grids = [d for d in descs if d[1].startswith("Tree_float_5_4_3")]
    if not float_grids:
        raise VdbError(
            f"no float 5-4-3 grids found (grids: {[(d[0], d[1]) for d in descs]})"
        )
    pick = None
    for d in float_grids:
        bare = d[0].split("[")[0]
        if grid_name is not None and bare == grid_name:
            pick = d
        if grid_name is None and bare == "density":
            pick = d
    if pick is None:
        if grid_name is not None:
            raise VdbError(f"grid {grid_name!r} not in file: {[d[0] for d in descs]}")
        pick = float_grids[0]

    r.p = pick[2]
    grid_compression = compression
    if file_version >= 222:
        grid_compression = r.u32()
    _read_metadata(r)  # grid metadata
    _, voxel_size, translate = _read_transform(r)
    leaves, tiles, background = _read_tree(r, grid_compression, file_version)

    # Tiles with the background value are no-ops (the dense array is
    # background-filled); root-level tiles span 4096 voxels/side and would
    # explode the dense bounding box, so they are rejected rather than
    # silently mis-loaded.
    tiles = [t for t in tiles if t[2] != background]
    for (origin, span, _val) in tiles:
        if span >= L2_SPAN:
            raise VdbError(
                f"active root-level value tile at {origin} (span {span}) — "
                "too large to densify; re-export the grid with leaves"
            )
    if not leaves and not tiles:
        raise VdbError("grid has no active voxels (no leaves or value tiles)")
    extents = [(np.array(k), np.array(k) + L0_DIM) for k in leaves.keys()]
    extents += [(np.array(o), np.array(o) + s) for (o, s, _v) in tiles]
    lo = np.min(np.stack([e[0] for e in extents]), axis=0)
    hi = np.max(np.stack([e[1] for e in extents]), axis=0)
    shape_xyz = hi - lo
    dense = np.full(tuple(shape_xyz[::-1]), background, np.float32)  # (z, y, x)
    # Splat tiles first so leaf voxels (finer data) win any overlap.
    for ((ox, oy, oz), span, val) in tiles:
        x0, y0, z0 = ox - lo[0], oy - lo[1], oz - lo[2]
        dense[z0 : z0 + span, y0 : y0 + span, x0 : x0 + span] = val
    for (ox, oy, oz), vals in leaves.items():
        block = vals.reshape(L0_DIM, L0_DIM, L0_DIM)  # (x, y, z) index order
        zyx = np.transpose(block, (2, 1, 0))
        x0, y0, z0 = ox - lo[0], oy - lo[1], oz - lo[2]
        dense[z0 : z0 + L0_DIM, y0 : y0 + L0_DIM, x0 : x0 + L0_DIM] = zyx
    return VdbGrid(
        name=pick[0].split("[")[0],
        values=dense,
        origin_ijk=lo.astype(np.int64),
        voxel_size=voxel_size.astype(np.float64),
        translate=translate.astype(np.float64),
        background=float(background),
    )


# ---------------------------------------------------------------------------
# Minimal writer (round-trip tests; uses the same 224 layout the reader
# understands, ZIP or raw value buffers).


def write_vdb(path: str, values: np.ndarray, grid_name: str = "density",
              voxel_size: float = 1.0, compress=True,
              tile_uniform_leaves: bool = False) -> None:
    """Write a dense (D, H, W) float array as a single-FloatGrid .vdb.

    `compress`: True/"zip" = zlib value buffers, "blosc" = blosc1-LZ4
    chunks (OpenVDB's own default codec), False = raw.

    With `tile_uniform_leaves`, 8^3 blocks whose voxels are all equal and
    non-zero are written as level-1 active value TILES instead of leaves —
    the compact form OpenVDB itself produces for constant fog regions
    (used to test the reader's tile densification)."""
    values = np.asarray(values, np.float32)
    d, h, w = values.shape
    out = bytearray()

    def u32(x):
        out.extend(struct.pack("<I", x))

    def i64(x):
        out.extend(struct.pack("<q", x))

    def f32(x):
        out.extend(struct.pack("<f", float(x)))

    def string(sv):
        b = sv.encode()
        u32(len(b))
        out.extend(b)

    if compress == "blosc":
        compression = COMPRESS_BLOSC
    elif compress:
        compression = COMPRESS_ZIP
    else:
        compression = COMPRESS_NONE

    i64(MAGIC)
    u32(224)  # file version
    u32(10), u32(0)  # library version
    out.append(1)  # has grid offsets
    u32(compression)
    out.extend(b"0" * 36)  # uuid
    u32(0)  # file metadata count
    u32(1)  # one grid

    string(f"{grid_name}")
    string("Tree_float_5_4_3")
    offsets_at = len(out)
    i64(0), i64(0), i64(0)  # patched below

    grid_pos = len(out)
    u32(compression)
    u32(0)  # grid metadata count
    # transform
    string("UniformScaleMap")
    for _ in range(3):
        out.extend(struct.pack("<d", voxel_size))
    for v in (voxel_size, voxel_size, voxel_size,
              1.0 / voxel_size, 1.0 / voxel_size, 1.0 / voxel_size):
        out.extend(struct.pack("<d", v))

    # ---- tree
    u32(1)  # buffer count
    f32(0.0)  # background
    u32(0)  # tiles

    # Partition voxels into leaves, leaves into one (or more) L2 nodes.
    nz = np.argwhere(values != 0.0)
    if nz.size == 0:
        raise VdbError("refusing to write an empty grid")
    # index order: values[z, y, x] -> coord (x, y, z)
    coords = nz[:, ::-1]
    leaf_keys = sorted({tuple((c // L0_DIM) * L0_DIM) for c in coords})
    l2_keys = sorted({tuple((np.array(k) // L2_SPAN) * L2_SPAN) for k in leaf_keys})
    u32(len(l2_keys))

    def leaf_values(key):
        x0, y0, z0 = key
        blk = np.zeros((L0_DIM, L0_DIM, L0_DIM), np.float32)  # (x, y, z)
        zs = values[z0 : z0 + L0_DIM, y0 : y0 + L0_DIM, x0 : x0 + L0_DIM]
        blk[: zs.shape[2], : zs.shape[1], : zs.shape[0]] = np.transpose(zs, (2, 1, 0))
        return blk.reshape(-1)

    def write_mask(bits):
        packed = np.packbits(bits.astype(np.uint8), bitorder="little")
        out.extend(packed.tobytes())

    def write_vals(vals):
        out.append(NO_MASK_AND_ALL_VALS & 0xFF)  # metadata code 6
        raw = vals.astype("<f4").tobytes()
        if compression & COMPRESS_BLOSC:
            from vpt_tpu.scene import blosc as blosc_mod

            comp = blosc_mod.compress(raw, typesize=4)
            i64(len(comp))
            out.extend(comp)
        elif compression & COMPRESS_ZIP:
            comp = zlib.compress(raw)
            i64(len(comp))
            out.extend(comp)
        else:
            out.extend(raw)

    ordered_leaves = []
    for l2 in l2_keys:
        l2 = np.array(l2)
        for c in (l2,):
            out.extend(struct.pack("<3i", *[int(v) for v in c]))
        # level-2 masks
        child2 = np.zeros(L2_N, bool)
        l1_present = sorted({
            tuple(((np.array(k) - l2) // L1_SPAN))
            for k in leaf_keys
            if np.all((np.array(k) >= l2) & (np.array(k) < l2 + L2_SPAN))
        })
        for (cx, cy, cz) in l1_present:
            child2[(cx << (2 * L2_LOG2)) + (cy << L2_LOG2) + cz] = True
        write_mask(child2)
        write_mask(np.zeros(L2_N, bool))
        write_vals(np.zeros(L2_N, np.float32))
        for (cx, cy, cz) in l1_present:
            l1_origin = l2 + np.array([cx, cy, cz]) * L1_SPAN
            child1 = np.zeros(L1_N, bool)
            value1 = np.zeros(L1_N, bool)
            vals1 = np.zeros(L1_N, np.float32)
            leaves_here = sorted({
                tuple((np.array(k) - l1_origin) // L0_DIM)
                for k in leaf_keys
                if np.all((np.array(k) >= l1_origin) & (np.array(k) < l1_origin + L1_SPAN))
            })
            kept = []
            for (lx, ly, lz) in leaves_here:
                slot = (lx << (2 * L1_LOG2)) + (ly << L1_LOG2) + lz
                key = tuple(l1_origin + np.array([lx, ly, lz]) * L0_DIM)
                vals = leaf_values(key)
                if tile_uniform_leaves and vals[0] != 0.0 and np.all(vals == vals[0]):
                    value1[slot] = True  # active value tile
                    vals1[slot] = vals[0]
                else:
                    child1[slot] = True
                    kept.append((key, vals))
            write_mask(child1)
            write_mask(value1)
            write_vals(vals1)
            for key, vals in kept:
                write_mask(vals != 0.0)
                ordered_leaves.append(vals)

    for vals in ordered_leaves:
        write_vals(vals)

    end_pos = len(out)
    struct.pack_into("<qqq", out, offsets_at, grid_pos, grid_pos, end_pos)
    open(path, "wb").write(bytes(out))
