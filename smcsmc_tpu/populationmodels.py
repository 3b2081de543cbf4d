"""``Population`` container + preset models — the reference's simulation-layer
API (smcsmc/populationmodels.py:25-272 container, :715-867 presets).

A ``Population`` holds an ms-style parameterization (times in 4*N0 units,
sizes relative to N0, migration as 4*N0*m) and converts to/from the
framework's natural-unit :class:`~smcsmc_tpu.demography.Demography`; its
``simulate`` produces .seg data via the built-in coalescent simulator
(replacing the scrm subprocess, populationmodels.py:439-500).
"""

from __future__ import annotations

import numpy as np

from .demography import Demography, parse_scrm_args
from .segio import write_seg

defaults = {
    "N0": 10000,
    "mutation_rate": 2.5e-9,
    "recombination_rate": 1e-9,
    "sequence_length": 1e6,
    "num_samples": 2,
}


class Population:
    def __init__(
        self,
        N0=defaults["N0"],
        mutation_rate=defaults["mutation_rate"],
        recombination_rate=defaults["recombination_rate"],
        sequence_length=defaults["sequence_length"],
        num_samples=defaults["num_samples"],
        change_points=(0, 0.01, 0.06, 0.2, 1, 2),
        population_sizes=(1, 0.1, 1, 0.5, 1, 2),
        num_populations=1,
        migration_rates=None,
        sample_populations=None,
        sample_times=None,
        migration_commands=None,
        seed=(1,),
        filename=None,
    ):
        self.N0 = N0
        self.mutation_rate = mutation_rate
        self.recombination_rate = recombination_rate
        self.sequence_length = sequence_length
        self.num_samples = num_samples
        self.change_points = list(change_points)
        self.population_sizes = [
            s if isinstance(s, (list, tuple)) else [s] * num_populations
            for s in population_sizes
        ]
        self.num_populations = num_populations
        self.migration_rates = migration_rates
        self.sample_populations = sample_populations
        self.sample_times = sample_times
        self.migration_commands = migration_commands
        self.seed = seed if isinstance(seed, (list, tuple)) else (seed,)
        self.filename = filename

    # -- conversion --------------------------------------------------------

    def to_demography(self) -> Demography:
        E = len(self.change_points)
        P = self.num_populations
        four_n0 = 4 * self.N0
        mig = np.zeros((E, P, P))
        if self.migration_rates is not None:
            mig = np.array(self.migration_rates, dtype=float) / four_n0
        splits = []
        if self.migration_commands:
            for cmd in self.migration_commands:
                if not cmd:
                    continue
                toks = cmd.split()
                i = 0
                while i < len(toks):
                    if toks[i] == "-ej":
                        t = float(toks[i + 1]) * four_n0
                        splits.append((t, int(toks[i + 2]) - 1, int(toks[i + 3]) - 1))
                        i += 4
                    else:
                        i += 1
        if self.sample_populations is not None:
            sample_pops = np.array(self.sample_populations, dtype=np.int32) - 1
        elif P > 1:
            # split samples evenly across populations (scrm -I convention)
            per = self.num_samples // P
            sample_pops = np.repeat(np.arange(P, dtype=np.int32), per)
        else:
            sample_pops = np.zeros(self.num_samples, dtype=np.int32)
        sample_times = (
            np.array(self.sample_times, dtype=float) * four_n0
            if self.sample_times is not None
            else np.zeros(len(sample_pops))
        )
        return Demography(
            change_times=np.array(self.change_points, dtype=float) * four_n0,
            pop_sizes=np.array(self.population_sizes, dtype=float) * self.N0,
            mig_rates=mig,
            splits=splits,
            sample_pops=sample_pops,
            sample_times=sample_times,
            mutation_rate=self.mutation_rate,
            recombination_rate=self.recombination_rate,
            sequence_length=self.sequence_length,
            n0=self.N0,
        )

    def parse_command_line(self, cmdline: str) -> list[str]:
        """Parse ms/scrm-style options (populationmodels.py:73-182); returns
        unrecognized options."""
        known = {"-N0", "-nsam", "-I", "-eI", "-ej", "-eM", "-ema", "-em",
                 "-eN", "-en", "-t", "-r", "-seed", "-M"}
        toks = cmdline.split()
        keep, rest = [], []
        i = 0
        while i < len(toks):
            if toks[i] in known:
                keep.append(toks[i])
                i += 1
                while i < len(toks) and not toks[i].startswith("-"):
                    keep.append(toks[i])
                    i += 1
            else:
                rest.append(toks[i])
                i += 1
        demo = parse_scrm_args(keep, n0=self.N0)
        self._from_demography(demo)
        return rest

    def _from_demography(self, demo: Demography):
        four_n0 = 4 * demo.n0
        self.N0 = demo.n0
        self.change_points = list(demo.change_times / four_n0)
        self.population_sizes = (demo.pop_sizes / demo.n0).tolist()
        self.migration_rates = (demo.mig_rates * four_n0).tolist()
        self.num_populations = demo.num_populations
        self.num_samples = demo.num_samples
        self.sample_populations = (demo.sample_pops + 1).tolist()
        self.sample_times = list(demo.sample_times / four_n0)
        self.mutation_rate = demo.mutation_rate
        self.recombination_rate = demo.recombination_rate
        self.sequence_length = demo.sequence_length
        self.migration_commands = [
            f"-ej {t / four_n0} {s + 1} {k + 1}" for t, s, k in demo.splits
        ] or None

    def core_command_line(self) -> str:
        return self.to_demography().core_command_line()

    # -- simulation --------------------------------------------------------

    def simulate(
        self, missing_leaves=(), phased=True, filename=None, seed=None
    ):
        """Simulate .seg data (populationmodels.py:439-500)."""
        from .simulate import simulate_seg

        seed = seed if seed is not None else self.seed[0]
        seg = simulate_seg(
            self.to_demography(),
            seed=int(seed),
            missing_leaves=list(missing_leaves),
            phased=phased,
        )
        fn = filename or self.filename
        if fn:
            write_seg(fn, seg)
        return seg


class Pop2(Population):
    pass


def _preset(cls_defaults):
    class _Preset(Population):
        def __init__(self, **kwargs):
            for key, value in cls_defaults.items():
                kwargs.setdefault(key, value)
            super().__init__(**kwargs)

    return _Preset


Pop4 = _preset(
    {
        "change_points": [0, 0.01, 0.06, 0.2, 1, 2],
        "population_sizes": [1, 0.1, 1, 0.5, 1, 2],
        "num_samples": 4,
    }
)
PopSingleConst = _preset(
    {"change_points": [0, 0.5, 1.0], "population_sizes": [1, 1, 1], "num_samples": 4}
)
PopSingleExpand = _preset(
    {"change_points": [0, 0.02], "population_sizes": [2, 1], "num_samples": 4}
)
PopSingleShrink = _preset(
    {"change_points": [0, 0.02], "population_sizes": [0.5, 1], "num_samples": 4}
)
PopSingleBottleneck = _preset(
    {
        "change_points": [0, 0.02, 0.04],
        "population_sizes": [1, 0.5, 1],
        "num_samples": 4,
    }
)
TwoPopUniDirMigr = _preset(
    {
        "change_points": [0, 0.1, 0.5],
        "population_sizes": [[1, 1], [1, 1], [1, 1]],
        "num_populations": 2,
        "migration_rates": [
            [[0, 0], [1, 0]],
            [[0, 0], [1, 0]],
            [[0, 0], [1, 0]],
        ],
        "num_samples": 8,
    }
)
TwoPopBiDirMigr = _preset(
    {
        "change_points": [0, 0.1, 0.5],
        "population_sizes": [[1, 1], [1, 1], [1, 1]],
        "migration_rates": [
            [[0, 0.5], [0.5, 0]],
            [[0, 0.5], [0.5, 0]],
            [[0, 0.5], [0.5, 0]],
        ],
        "num_samples": 8,
        "num_populations": 2,
    }
)
TwoPopSplitNoMigr = _preset(
    {
        "change_points": [0, 0.1, 0.5],
        "population_sizes": [[1, 1], [1, 1], [1, 1]],
        "num_populations": 2,
        "migration_commands": [None, None, "-ej 0.5 2 1"],
        "num_samples": 8,
    }
)
