"""Minimal PLY reader/writer (numpy, no plyfile dependency).

Covers the two layouts the framework needs:

* reading an initial point cloud (``specified_ply_path``; the reference
  zeroes colors/normals — ``fetchPly_modi`` dataset_readers.py:229-237);
* the anchor checkpoint layout of ``save_ply``/``load_ply_sparse_gaussian``
  (gaussian_model.py:620-686): x,y,z, nx,ny,nz, f_offset_*, f_anchor_feat_*,
  opacity, uncertainty, scale_0..5, rot_0..3 — all float32, binary
  little-endian.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_PLY_TYPES = {
    "float": ("<f4", 4), "float32": ("<f4", 4),
    "double": ("<f8", 8), "float64": ("<f8", 8),
    "int": ("<i4", 4), "int32": ("<i4", 4),
    "uint": ("<u4", 4), "uint32": ("<u4", 4),
    "short": ("<i2", 2), "ushort": ("<u2", 2),
    "char": ("<i1", 1), "uchar": ("<u1", 1), "uint8": ("<u1", 1),
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the first ``vertex`` element: {property: (N,) array}."""
    with open(path, "rb") as f:
        header: List[str] = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vertex = 0
        props: List[Tuple[str, str]] = []
        in_vertex = False
        for line in header:
            parts = line.split()
            if parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError("list properties unsupported")
                props.append((parts[2], parts[1]))

        if fmt == "ascii":
            rows = []
            for _ in range(n_vertex):
                rows.append([float(x) for x in
                             f.readline().decode().split()])
            arr = np.asarray(rows)
            return {name: arr[:, i] for i, (name, _) in enumerate(props)}

        dtype = np.dtype([(name, _PLY_TYPES[t][0]) for name, t in props])
        data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype,
                             count=n_vertex)
        return {name: np.ascontiguousarray(data[name])
                for name, _ in props}


def read_ply_xyz(path: str) -> np.ndarray:
    d = read_ply(path)
    return np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)


def write_ply(path: str, columns: Dict[str, np.ndarray]) -> None:
    """Write a binary little-endian vertex element with float32 columns."""
    names = list(columns)
    n = len(next(iter(columns.values())))
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {n}"]
        hdr += [f"property float {name}" for name in names]
        hdr.append("end_header")
        f.write(("\n".join(hdr) + "\n").encode("ascii"))
        arr = np.stack([np.asarray(columns[c], np.float32)
                        for c in names], 1)
        f.write(arr.astype("<f4").tobytes())
