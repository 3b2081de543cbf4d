"""Analysis of result.out files (reference: smcsmc/output.py:12-96)."""

from __future__ import annotations

import pandas as pd


class Output:
    """Pandas wrapper around a ``result.out`` file.

    Columns: Iter Epoch Start End Type From To Opp Count Rate Ne ESS [Clump].
    """

    def __init__(self, path: str):
        self.path = path
        self.data = pd.read_csv(path, sep=r"\s+")

    @property
    def final_iteration(self) -> int:
        return int(self.data["Iter"].max())

    def subset_time(self, start: float, end: float) -> pd.DataFrame:
        """Rows whose epoch overlaps [start, end) generations."""
        d = self.data
        return d[(d["End"] > start) & (d["Start"] < end)]

    def ne(self, iteration: int | None = None, pop: int = 0) -> pd.DataFrame:
        """Coalescent rows -> (Start, Ne) trajectory for one population."""
        it = self.final_iteration if iteration is None else iteration
        d = self.data
        return d[
            (d["Type"] == "Coal") & (d["Iter"] == it) & (d["From"] == pop)
        ][["Start", "End", "Ne"]]

    def migration(self, iteration: int | None = None) -> pd.DataFrame:
        it = self.final_iteration if iteration is None else iteration
        d = self.data
        return d[(d["Type"] == "Migr") & (d["Iter"] == it)]

    def log_likelihood(self, iteration: int | None = None) -> float:
        it = self.final_iteration if iteration is None else iteration
        d = self.data
        row = d[(d["Type"] == "LogL") & (d["Iter"] == it)]
        return float(row["Count"].iloc[0])

    def integrate_migration(
        self, iteration: int | None = None, source: int = 0, sink: int = 1
    ) -> pd.DataFrame:
        """Cumulative migrated fraction over time (output.py:integrate_
        migration): fraction = 1 - exp(-cumsum(rate * epoch_length))."""
        import numpy as np

        mig = self.migration(iteration)
        mig = mig[(mig["From"] == source) & (mig["To"] == sink)].sort_values("Start")
        length = (mig["End"].clip(upper=1e7) - mig["Start"]).to_numpy()
        rate = mig["Rate"].to_numpy()
        cum = np.cumsum(rate * length)
        out = mig[["Start", "End", "Rate"]].copy()
        out["Integrated"] = 1.0 - np.exp(-cum)
        return out
