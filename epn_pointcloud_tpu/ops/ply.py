"""Minimal PLY point-cloud IO (ascii + binary_little_endian), pure numpy.

Replaces the reference's plyfile dependency (ref: vgtk/vgtk/pc/io.py:6-93 and
SPConvNets/datasets/evaluation/ply_io.py). Supports the subset the pipelines
need: vertex elements with float/uchar scalar properties.
"""

from __future__ import annotations

import numpy as np

_PLY_TYPES = {
    'float': ('f4', 4), 'float32': ('f4', 4), 'double': ('f8', 8),
    'float64': ('f8', 8), 'uchar': ('u1', 1), 'uint8': ('u1', 1),
    'char': ('i1', 1), 'int8': ('i1', 1), 'short': ('i2', 2),
    'ushort': ('u2', 2), 'int': ('i4', 4), 'int32': ('i4', 4),
    'uint': ('u4', 4), 'uint32': ('u4', 4),
}


def load_ply(path: str, properties=('x', 'y', 'z')) -> np.ndarray:
    """Load requested vertex properties as float32 [n, len(properties)]."""
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii', errors='replace').strip()
            header.append(line)
            if line == 'end_header':
                break
        fmt = next(l.split()[1] for l in header if l.startswith('format'))
        counts, props, cur = {}, {}, None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'element':
                cur = parts[1]
                counts[cur] = int(parts[2])
                props[cur] = []
            elif parts[0] == 'property' and cur is not None:
                if parts[1] == 'list':
                    props[cur].append(('list', parts[2], parts[3], parts[4]))
                else:
                    props[cur].append((parts[1], parts[2]))

        n = counts.get('vertex', 0)
        vprops = props.get('vertex', [])
        names = [p[1] for p in vprops if p[0] != 'list']

        if fmt == 'ascii':
            rows = []
            for _ in range(n):
                rows.append([float(x) for x in f.readline().split()[:len(names)]])
            data = np.asarray(rows, dtype=np.float64)
            table = {nm: data[:, i] for i, nm in enumerate(names)}
        elif fmt == 'binary_little_endian':
            dtype = np.dtype([(p[1], '<' + _PLY_TYPES[p[0]][0]) for p in vprops])
            raw = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)
            table = {nm: raw[nm].astype(np.float64) for nm in names}
            # NOTE: any non-vertex elements after the vertex block are ignored.
        else:
            raise ValueError(f'unsupported ply format {fmt}')

    cols = [table[p] for p in properties if p in table]
    return np.stack(cols, axis=1).astype(np.float32)


def load_ply_mesh(path: str):
    """Load (vertices [n,3] float32, faces [m,3] int64) from an ascii or
    binary_little_endian PLY with triangular faces.

    Needed for the reference-convention anchor derivation, which consumes the
    icosahedron mesh's faces, not just its vertices (ref:
    vgtk/vgtk/functional/rotation.py:240-244 via trimesh.load). Handles
    variable-length list properties in the face element (vertex_indices plus
    any trailing lists/scalars, e.g. VCGLIB's texcoord + color properties).
    """
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii', errors='replace').strip()
            header.append(line)
            if line == 'end_header':
                break
        fmt = next(l.split()[1] for l in header if l.startswith('format'))
        counts, props, cur = {}, {}, None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'element':
                cur = parts[1]
                counts[cur] = int(parts[2])
                props[cur] = []
            elif parts[0] == 'property' and cur is not None:
                if parts[1] == 'list':
                    props[cur].append(('list', parts[2], parts[3], parts[4]))
                else:
                    props[cur].append((parts[1], parts[2]))

        nv, nf = counts['vertex'], counts['face']
        vprops, fprops = props['vertex'], props['face']

        if fmt == 'ascii':
            verts = []
            vnames = [p[1] for p in vprops if p[0] != 'list']
            for _ in range(nv):
                vals = f.readline().split()
                verts.append([float(vals[vnames.index(a)]) for a in 'xyz'])
            faces = []
            for _ in range(nf):
                vals = f.readline().split()
                k = int(vals[0])
                faces.append([int(v) for v in vals[1:1 + k]])
        elif fmt == 'binary_little_endian':
            vdtype = np.dtype([(p[1], '<' + _PLY_TYPES[p[0]][0]) for p in vprops])
            raw = np.frombuffer(f.read(vdtype.itemsize * nv), dtype=vdtype, count=nv)
            verts = np.stack([raw[a].astype(np.float64) for a in 'xyz'], axis=1)
            buf = f.read()
            off = 0
            faces = []
            for _ in range(nf):
                row = None
                for p in fprops:
                    if p[0] == 'list':
                        cnt_t, val_t = _PLY_TYPES[p[1]], _PLY_TYPES[p[2]]
                        k = int(np.frombuffer(buf, '<' + cnt_t[0], 1, off)[0])
                        off += cnt_t[1]
                        vals = np.frombuffer(buf, '<' + val_t[0], k, off)
                        off += val_t[1] * k
                        if p[3] == 'vertex_indices' or p[3] == 'vertex_index':
                            row = vals.astype(np.int64)
                    else:
                        off += _PLY_TYPES[p[0]][1]
                faces.append(row)
        else:
            raise ValueError(f'unsupported ply format {fmt}')

    verts = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int64)
    assert faces.shape[1] == 3, 'only triangular meshes supported'
    return verts, faces


def save_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None,
             c: str | None = None, binary: bool = False) -> None:
    """Save [n,3] points (optionally with uint8 colors or color char
    'r'/'g'/'b') — mirrors vgtk.pc.save_ply's surface."""
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if colors is None and c is not None:
        cmap = {'r': (255, 0, 0), 'g': (0, 255, 0), 'b': (0, 0, 255)}
        colors = np.tile(np.array(cmap.get(c, (255, 255, 255)), np.uint8), (n, 1))
    header = ['ply',
              'format binary_little_endian 1.0' if binary else 'format ascii 1.0',
              f'element vertex {n}',
              'property float x', 'property float y', 'property float z']
    if colors is not None:
        header += ['property uchar red', 'property uchar green', 'property uchar blue']
    header.append('end_header')
    with open(path, 'wb') as f:
        f.write(('\n'.join(header) + '\n').encode('ascii'))
        if binary:
            if colors is not None:
                dt = np.dtype([('x', '<f4'), ('y', '<f4'), ('z', '<f4'),
                               ('r', 'u1'), ('g', 'u1'), ('b', 'u1')])
                rec = np.empty(n, dtype=dt)
                rec['x'], rec['y'], rec['z'] = points.T
                rec['r'], rec['g'], rec['b'] = np.asarray(colors, np.uint8).T
                f.write(rec.tobytes())
            else:
                f.write(points.astype('<f4').tobytes())
        else:
            for i in range(n):
                row = '%f %f %f' % tuple(points[i])
                if colors is not None:
                    row += ' %d %d %d' % tuple(int(v) for v in colors[i])
                f.write((row + '\n').encode('ascii'))
