"""Shared helpers for the soak tools: the marker-delimited-section
splice every tool uses to own its SCALE.md span, plus small
filesystem utilities (dir_size) they previously each re-implemented.

Every soak tool owns one or more SCALE.md sections delimited by HTML
comment markers; replace_section swaps exactly the span between a
tool's own start/end markers and leaves everything else byte-identical.
A start marker without its end marker is an ERROR, not a silent
truncation -- splitting naively there would delete every later
section (other tools' included) from the document.
"""

from __future__ import annotations

import os


def replace_section(path: str, start: str, end: str, block: str) -> None:
    """Replace the [start, end] span of ``path`` with ``block`` (which
    must itself begin with ``start`` and end with ``end``); append the
    block if the markers are absent. Raises if the document is
    malformed (start without end, or end before start)."""
    if os.path.exists(path):
        with open(path) as f:
            doc = f.read()
    else:
        doc = ""
    if start in doc:
        i = doc.index(start)
        j = doc.find(end, i)
        if j == -1:
            raise ValueError(
                f"{path}: start marker {start!r} has no matching end "
                f"marker {end!r}; refusing to splice (it would delete "
                "every later section)"
            )
        doc = doc[:i] + block.strip("\n") + doc[j + len(end):]
    else:
        if end in doc:
            raise ValueError(f"{path}: end marker {end!r} without start")
        doc = doc.rstrip("\n") + "\n\n" + block.strip("\n") + "\n"
    with open(path, "w") as f:
        f.write(doc)


def dir_size(path: str) -> int:
    """Recursive on-disk byte count, tolerant ONLY of files vanishing
    mid-walk (Spark temp/.part files being committed or cleaned while
    a soak tool measures a live directory). Any other IO problem
    (EACCES, corrupt fs) stays loud -- silently skipping it would
    understate the size figures recorded in SCALE.md."""
    tot = 0
    for root_, _, files in os.walk(path):
        for fn in files:
            try:
                tot += os.path.getsize(os.path.join(root_, fn))
            except FileNotFoundError:
                pass
    return tot
