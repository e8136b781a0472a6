"""Hierarchical polygon ("tile tree") discovery.

Engine analogue of the reference's ``Poly::get_poly_from_dir``
(``src/diffs.rs:194-260``): scan a directory tree for ``.poly`` files;
a directory with the same stem as a sibling ``.poly`` nests under it;
siblings are ordered by file path (``src/diffs.rs:239-246``).

Unlike the reference — which walks this tree recursively, re-filtering
the parent's output per child (``src/diffs.rs:168-191``) — the engine
flattens the tree into a list of (poly_path, MultiPolygon) entries and
performs ONE multi-label spatial join: a child polygon's row set is a
subset of its parent's, so emitting every matching path per row
reproduces each per-node output exactly (SURVEY.md §3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..geom import MultiPolygon
from .polyfile import read_multipolygon


@dataclass
class PolyNode:
    """One node of the polygon tree (file=None for pure directories)."""

    file: str | None
    hier_name: str  # e.g. "./africa/spain/canarias"
    name: str
    inners: list["PolyNode"] = field(default_factory=list)

    def walk(self):
        """Yield nodes with a .poly file, depth-first, pre-order."""
        if self.file is not None:
            yield self
        for child in self.inners:
            yield from child.walk()


def get_poly_from_dir(directory: str) -> PolyNode:
    return _from_path(directory, None, ".", "")


def _from_path(directory: str, file: str | None, hier: str, name: str) -> PolyNode:
    inners: list[PolyNode] = []
    for entry in os.scandir(directory):
        path = entry.path
        if entry.is_file():
            stem, ext = os.path.splitext(entry.name)
            if ext == ".poly":
                sub = os.path.join(directory, stem)
                hier_name = f"{hier}/{stem}"
                if os.path.isdir(sub):
                    inners.append(_from_path(sub, path, hier_name, stem))
                else:
                    inners.append(PolyNode(file=path, hier_name=hier_name, name=stem))
        elif entry.is_dir():
            # directory shadowed by same-name .poly handled above
            if os.path.exists(path + ".poly"):
                continue
            stem = entry.name
            # file-less nodes carry an empty name (src/diffs.rs:247-252)
            inners.append(_from_path(path, None, f"{hier}/{stem}", ""))
    # siblings sorted by .poly file path; file-less dirs sort as "None"
    # (src/diffs.rs:239-246)
    inners.sort(key=lambda p: p.file if p.file is not None else "None")
    return PolyNode(file=file, hier_name=hier, name=name, inners=inners)


def load_tree_polys(root: PolyNode) -> list[tuple[str, str, MultiPolygon]]:
    """Flatten: [(hier_name, name-from-file-line-1, MultiPolygon)] for every
    node that has a .poly file, in depth-first pre-order."""
    out = []
    for node in root.walk():
        poly_name, mp = read_multipolygon(node.file)
        out.append((node.hier_name, poly_name, mp))
    return out
