"""Two-population human (CEU/YRI-style) simulation scenarios with
parameterized migration pulses (reference: smcsmc/simulations.py:9-277).

Builds a :class:`~smcsmc_tpu.demography.Demography` for a split model with a
migration pulse of given midpoint/duration/proportion (in years), in the
forward (African -> Eurasian), backward, bidirectional, or none direction,
and simulates .seg data with the built-in coalescent simulator.
"""

from __future__ import annotations

import math

import numpy as np

from .demography import Demography
from .simulate import simulate_seg


class Simulation:
    def __init__(
        self,
        L: float,
        haps: int,
        midpoint: float,
        duration: float,
        proportion: float,
        direction: str = "forward",
        N0: float = 14312,
        g: float = 29.0,
        mu: float = 1.25e-8,
        rho: float = 3e-9,
    ):
        """midpoint/duration in years; proportion converted to a backwards
        migration rate over the pulse window; split at ~200 kya."""
        g0, g1 = 133.0, 133016.0
        epochs = 27
        g_split = 200000.0 / g
        self.samples = haps
        # log-spaced epoch boundaries (generations) + pulse boundaries
        times = [0.0] + [
            g0 * 0.99 * math.exp(math.log(g1 / g0) * i / (epochs - 1))
            for i in range(epochs)
        ]
        t_lo = (midpoint - duration / 2.0) / g
        t_hi = (midpoint + duration / 2.0) / g
        times += [t_lo, t_hi]
        times = sorted(set(t for t in times if t >= 0.0))

        E = len(times)
        pop_sizes = np.full((E, 2), N0)
        mig = np.zeros((E, 2, 2))
        # pulse rate: proportion replaced over the window
        rate = -math.log(max(1.0 - proportion, 1e-12)) / max(t_hi - t_lo, 1.0)
        for e, t in enumerate(times):
            if t_lo <= t < t_hi and t < g_split:
                if direction in ("forward", "bidirectional", "realistic"):
                    mig[e, 1, 0] = rate  # Eurasian lineages trace to Africa
                if direction in ("backward", "bidirectional"):
                    mig[e, 0, 1] = rate
                if direction == "realistic":
                    mig[e, 0, 1] = rate / 10.0
        splits = [(min(t for t in times if t >= g_split - 1), 1, 0)] if any(
            t >= g_split - 1 for t in times
        ) else []
        if not splits:
            times.append(g_split)
            times = sorted(times)
            E = len(times)
            pop_sizes = np.full((E, 2), N0)
            mig2 = np.zeros((E, 2, 2))
            mig2[: mig.shape[0]] = mig
            mig = mig2
            splits = [(g_split, 1, 0)]

        n_half = haps // 2
        self.demography = Demography(
            change_times=np.array(times),
            pop_sizes=pop_sizes,
            mig_rates=mig,
            splits=splits,
            sample_pops=np.array([0] * n_half + [1] * (haps - n_half), np.int32),
            mutation_rate=mu,
            recombination_rate=rho,
            sequence_length=L,
            n0=N0,
        )

    def simulate(self, seed: int = 1, filename: str | None = None):
        seg = simulate_seg(self.demography, seed=seed)
        if filename:
            from .segio import write_seg

            write_seg(filename, seg)
        return seg
