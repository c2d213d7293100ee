"""Fluent legacy ``.msh`` (ASCII) parser and writer.

Replaces vtkFLUENTReader (/root/reference/dataset/GraphDataset.py:323-330).
The format is scheme-like sections ``(index (header-args) [payload])`` with
hexadecimal indices:

  (0 "comment")                         comment
  (2 ND)                                dimensionality
  (10 (0 first last 0 ND))              node count declaration (zone 0)
  (10 (zid first last type ND)( ... ))  node coordinates, one point per line
  (12 (0 first last 0))                 cell count declaration
  (12 (zid first last type etype))      cell zone declaration
  (13 (zid first last bctype ftype)(...)) faces: each row
        [nnodes] n0 n1 ... c0 c1        (hex; nnodes present for mixed ftype 0)
  (45 (zid type name)())                zone name metadata
  (39 (zid type name)())                alt zone metadata

Only what the pipeline needs is consumed (nodes, faces+adjacency, zone names);
unknown sections are skipped structurally.  Writer emits the same subset so
tests round-trip real parser behavior.
"""

from __future__ import annotations

import re

import numpy as np

from .fluent_mesh import BC_INTERIOR, BC_WALL, FaceZone, FluentMesh

_FACE_NNODES = {2: 2, 3: 3, 4: 4}  # linear/tri/quad face types


def _tokenize_sections(text: str):
    """Yields (index, header_args, payload_str) for each top-level section."""
    i, n = 0, len(text)
    while i < n:
        if text[i] != "(":
            i += 1
            continue
        # read section index
        j = i + 1
        while j < n and text[j] not in " (\n\t":
            j += 1
        idx_str = text[i + 1:j].strip()
        # find matching close paren, tracking strings
        depth, k = 1, i + 1
        while k < n and depth:
            c = text[k]
            if c == '"':
                k += 1
                while k < n and text[k] != '"':
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        body = text[i + 1:k - 1]
        # body starts with the index; strip it
        body = body[len(idx_str):].strip()
        header, payload = "", ""
        if body.startswith("("):
            depth2, m = 1, 1
            while m < len(body) and depth2:
                if body[m] == "(":
                    depth2 += 1
                elif body[m] == ")":
                    depth2 -= 1
                m += 1
            header = body[1:m - 1]
            payload = body[m:].strip()
            if payload.startswith("("):
                payload = payload[1:]
            if payload.endswith(")"):
                payload = payload[:-1]
        else:
            header = body
        try:
            index = int(idx_str)
        except ValueError:
            index = -1
        yield index, header, payload
        i = k


def read_msh(path: str) -> FluentMesh:
    with open(path) as f:
        text = f.read()

    points = None
    zone_names: dict[int, str] = {}
    raw_face_zones = []
    num_cells = 0

    for index, header, payload in _tokenize_sections(text):
        if index == 2:
            continue
        elif index == 10:
            args = [int(a, 16) for a in header.split()[:4]]
            zid, first, last = args[0], args[1], args[2]
            if zid == 0:
                total = last - first + 1
                points = np.zeros((total, 3), np.float64)
            else:
                coords = np.array(payload.split(), dtype=np.float64)
                nd = coords.size // (last - first + 1)
                coords = coords.reshape(-1, nd)
                if nd == 2:
                    coords = np.concatenate([coords, np.zeros((len(coords), 1))], 1)
                if points is None:
                    points = np.zeros((last, 3), np.float64)
                points[first - 1:last] = coords
        elif index == 12:
            args = [int(a, 16) for a in header.split()[:4]]
            zid, first, last = args[0], args[1], args[2]
            if zid == 0:
                num_cells = last - first + 1
            else:
                num_cells = max(num_cells, last)
        elif index == 13:
            args = [int(a, 16) for a in header.split()[:5]]
            zid, first, last, bctype = args[0], args[1], args[2], args[3]
            ftype = args[4] if len(args) > 4 else 0
            if zid == 0:
                continue
            nums = [int(t, 16) for t in payload.split()]
            faces, c0s, c1s = [], [], []
            pos = 0
            count = last - first + 1
            for _ in range(count):
                if ftype in _FACE_NNODES:
                    nn = _FACE_NNODES[ftype]
                else:
                    nn = nums[pos]
                    pos += 1
                nodes = np.array(nums[pos:pos + nn], np.int64) - 1
                pos += nn
                c0, c1 = nums[pos] - 1, nums[pos + 1] - 1
                pos += 2
                faces.append(nodes)
                c0s.append(c0)
                c1s.append(c1)
            raw_face_zones.append((zid, bctype, faces, np.array(c0s), np.array(c1s)))
        elif index in (39, 45):
            m = re.match(r"\s*(\d+)\s+(\S+)\s+(\S+)", header)
            if m:
                zone_names[int(m.group(1))] = f"{m.group(2)}:{m.group(3)}"

    zones = []
    for zid, bctype, faces, c0, c1 in raw_face_zones:
        name = zone_names.get(zid, f"zone-{zid}")
        lens = {len(f) for f in faces}
        fn = np.stack(faces) if len(lens) == 1 else faces
        zones.append(FaceZone(zid, bctype, name, fn, c0, c1))

    return FluentMesh(points=points.astype(np.float32), face_zones=zones,
                      num_cells=num_cells)


def write_msh(path: str, mesh: FluentMesh) -> None:
    """Writes the ASCII subset read_msh consumes (round-trip for tests)."""
    lines = ['(0 "fast_eng_super_resolution_tpu mesh")', "(2 3)"]
    n = len(mesh.points)
    lines.append(f"(10 (0 1 {n:x} 0 3))")
    coord_lines = "\n".join(" ".join(f"{v:.9e}" for v in p) for p in mesh.points)
    lines.append(f"(10 (1 1 {n:x} 1 3)(\n{coord_lines}\n))")
    lines.append(f"(12 (0 1 {mesh.num_cells:x} 0))")
    lines.append(f"(12 (2 1 {mesh.num_cells:x} 1 2))")

    first = 1
    for zone in mesh.face_zones:
        fn = zone.face_nodes
        faces = list(fn) if not (isinstance(fn, np.ndarray) and fn.ndim == 2) else [fn[i] for i in range(fn.shape[0])]
        last = first + len(faces) - 1
        rows = []
        for face, c0, c1 in zip(faces, zone.c0, zone.c1):
            toks = [f"{len(face):x}"] + [f"{v + 1:x}" for v in face] + [f"{c0 + 1:x}", f"{c1 + 1:x}"]
            rows.append(" ".join(toks))
        body = "\n".join(rows)
        lines.append(f"(13 ({zone.zone_id:x} {first:x} {last:x} {zone.bc_type:x} 0)(\n{body}\n))")
        first = last + 1

    for zone in mesh.face_zones:
        ztype, _, zname = zone.name.partition(":")
        lines.append(f"(45 ({zone.zone_id} {ztype} {zname or ztype})())")
    lines.append(f"(45 (2 interior {mesh.cell_zone_name})())")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
