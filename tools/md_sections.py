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
    b = block.strip("\n")
    if not (b.startswith(start) and b.endswith(end)):
        # a marker-less block spliced over [start, end] would DELETE
        # the markers: every later run then appends a fresh copy and
        # the document silently accumulates duplicate sections
        raise ValueError(
            "replace_section: block must begin with the start marker "
            "and end with the end marker (got "
            f"{b[:40]!r}...{b[-40:]!r})"
        )
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
    """Recursive on-disk byte count, tolerant ONLY of entries vanishing
    mid-walk (Spark temp/.part files/dirs being committed or cleaned
    while a soak tool measures a live directory). Any other IO problem
    (EACCES, corrupt fs) stays loud -- silently skipping it would
    understate the size figures recorded in SCALE.md. os.walk's default
    onerror=None would silently prune an unreadable subtree, so listing
    errors are re-raised here (a vanished dir is the tolerated case)."""

    def on_err(ex: OSError) -> None:
        if not isinstance(ex, FileNotFoundError):
            raise ex

    tot = 0
    for root_, _, files in os.walk(path, onerror=on_err):
        for fn in files:
            try:
                tot += os.path.getsize(os.path.join(root_, fn))
            except FileNotFoundError:
                pass
    return tot


def steady_noop_time(df_fn, samples: int = 3) -> float:
    """Steady-state execution time of a DataFrame plan: run to
    completion through the noop sink (executes every operator with
    zero sink cost -- unlike count(), which lets Spark prune work),
    warm once, then min-of-``samples`` back-to-back. The ONE copy of
    the warm-then-min protocol every SCALE.md soak table cites
    (previously re-implemented in ann_panel twice and graph_soak
    twice, which let the protocol drift); ``df_fn`` is a zero-arg
    plan builder so each sample re-plans exactly what a fresh query
    would."""
    import time

    df_fn().write.mode("overwrite").format("noop").save()  # warm
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        df_fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best
