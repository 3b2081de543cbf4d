"""PopSim-consortium CSV adapter (reference: smcsmc/popsim.py:17-33)."""

from __future__ import annotations


def convert_smcsmc_output(
    results_file: str, output_file: str, generation_time: float, num_generations=None
) -> None:
    """``result.out`` -> CSV with columns ``label, x, y, plot_type, plot_num``
    (years = generations * generation_time; y = Ne)."""
    from .output import Output

    out = Output(results_file)
    ne = out.ne()
    with open(output_file, "w") as fh:
        fh.write("label,x,y,plot_type,plot_num\n")
        for _, row in ne.iterrows():
            fh.write(
                f"pop0,{row['Start'] * generation_time},{row['Ne']},path,0\n"
            )
