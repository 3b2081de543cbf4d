""".trees ARG output and tskit-style postprocessing.

Reference: ``-arg`` dumps the sampled particle's event chain to ``.trees.gz``
(particleContainer.cpp:515-555): rows ``{R|C|M}  pos  time  from  to
descendants-bitstring``; smcsmc/trees2tskit.py parses them back into tables
and `utils.find_segments` extracts migrated tracts.  tskit is not available
in this environment, so the conversion surface returns plain numpy tables
(and raises with a clear message where a tskit TableCollection is required).
"""

from __future__ import annotations

import gzip

import numpy as np


def _desc_string(mask: int) -> str:
    """0/1 bitstring up to the highest set bit (descendants.hpp:50-64)."""
    if mask == 0:
        return "0"
    out = []
    while mask:
        out.append("1" if mask & 1 else "0")
        mask >>= 1
    return "".join(out)


def write_trees(
    path: str,
    arg_pos: np.ndarray,
    arg_code: np.ndarray,
    arg_time: np.ndarray,
    arg_from: np.ndarray,
    arg_to: np.ndarray,
    arg_desc: np.ndarray,
    arg_n: int,
    start_position: int = 1,
) -> None:
    """Write one particle's event ring to .trees.gz, oldest first."""
    A = len(arg_pos)
    n = int(arg_n)
    if n <= A:
        order = range(n)
    else:
        first = n % A
        order = list(range(first, A)) + list(range(first))
    codes = {0: "R", 1: "C", 2: "M"}
    with gzip.open(path, "wt") as fh:
        for i in order:
            fh.write(
                f"{codes[int(arg_code[i])]}\t"
                f"{float(arg_pos[i]) + start_position - 1:.1f}\t"
                f"{float(arg_time[i]):.1f}\t{int(arg_from[i])}\t"
                f"{int(arg_to[i])}\t{_desc_string(int(arg_desc[i]))}\n"
            )


def read_trees(path: str) -> np.ndarray:
    """Parse a .trees.gz into a structured array (trees2tskit.py front end)."""
    rows = []
    with gzip.open(path, "rt") as fh:
        for line in fh:
            code, pos, time, frm, to, desc = line.split()
            rows.append(
                (code, float(pos), float(time), int(frm), int(to),
                 int(desc[::-1], 2) if desc != "0" else 0)
            )
    return np.array(
        rows,
        dtype=[("code", "U1"), ("pos", "f8"), ("time", "f8"), ("from", "i4"),
               ("to", "i4"), ("desc", "u8")],
    )


def find_segments(
    trees_path: str,
    source: int,
    dest: int,
    tmin: float = 0.0,
    tmax: float = np.inf,
    sequence_length: float | None = None,
):
    """Migrated-haplotype tracts from the sampled ARG's M rows (reference:
    utils.find_segments -> trees2tskit migrationlist, utils.py:345-417).

    A migration hop recorded at genome position x on the branch with
    descendant set D and event time t persists along the genome until the
    first later recombination that cuts the SAME branch BELOW the event
    (R row with desc == D and recombination height < t) — that SPR replaces
    the branch section carrying the hop.  Returns a structured array with
    (left, right, time, source, dest, desc) bed-like tract rows filtered by
    direction and time window."""
    ev = read_trees(trees_path)
    end = float(sequence_length) if sequence_length else (
        float(ev["pos"].max()) if len(ev) else 0.0
    )
    m = ev[
        (ev["code"] == "M")
        & (ev["from"] == source)
        & (ev["to"] == dest)
        & (ev["time"] >= tmin)
        & (ev["time"] < tmax)
    ]
    r = ev[ev["code"] == "R"]
    tracts = []
    for row in m:
        cut = r[
            (r["pos"] > row["pos"])
            & (r["desc"] == row["desc"])
            & (r["time"] < row["time"])
        ]
        right = float(cut["pos"].min()) if len(cut) else end
        tracts.append(
            (float(row["pos"]), right, float(row["time"]),
             int(row["from"]), int(row["to"]), int(row["desc"]))
        )
    return np.array(
        tracts,
        dtype=[("left", "f8"), ("right", "f8"), ("time", "f8"),
               ("source", "i4"), ("dest", "i4"), ("desc", "u8")],
    )


def tract_fraction(tracts: np.ndarray, sequence_length: float, n: int) -> float:
    """Fraction of total haplotype-bp covered by migrated tracts (each tract
    covers its descendant leaves)."""
    if len(tracts) == 0:
        return 0.0
    nd = np.array([bin(int(d)).count("1") for d in tracts["desc"]])
    covered = np.sum((tracts["right"] - tracts["left"]) * nd)
    return float(covered / (sequence_length * n))


def trees_to_tskit(trees_path: str, sequence_length: float):
    """Convert to a tskit TableCollection (trees2tskit.py:361+); requires
    tskit, which is not bundled — raises ImportError with guidance."""
    try:
        import tskit  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "tskit is not installed in this environment; install tskit to "
            "convert .trees.gz event streams into tree sequences "
            "(read_trees() provides the parsed event table)"
        ) from e
    raise NotImplementedError("tskit conversion pending tskit availability")
