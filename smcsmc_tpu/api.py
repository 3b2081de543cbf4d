"""Python-level API: the reference's ``smcsmc.run_smcsmc`` / ``dict_to_args``
surface (utils.py:146-217)."""

from __future__ import annotations


def dict_to_args(smcsmc_params: dict) -> list[str]:
    """Convert an argument dict to an argv list (utils.py:189-217):
    ``{"EM": "10", "seg": "a.seg b.seg", "arg": ""}`` ->
    ``["-EM", "10", "-seg", "a.seg", "b.seg", "-arg"]``."""
    args = []
    for key, value in smcsmc_params.items():
        flag = key if key.startswith("-") else "-" + key
        args.append(flag)
        if value is not None and str(value) != "":
            args += str(value).split()
    return args


def run_smcsmc(smcsmc_params: dict) -> int:
    """Run a full inference from a parameter dict (utils.py:146-186)."""
    from .cli import smcsmc_main

    return smcsmc_main(dict_to_args(smcsmc_params))
