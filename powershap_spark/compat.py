"""Reference-compatible facade: ``PowerShap`` with the exact constructor
signature and defaults of the reference class (powershap/powershap.py:23-42
— note the SIGNATURE defaults, which the reference's own docstring
contradicts in two places: ``automatic=True`` and
``power_req_iterations=0.99``). A user of predict-idlab/powershap can

    from powershap_spark.compat import PowerShap
    PowerShap().fit(X, y).transform(X)

on pandas/numpy inputs, or hand ``fit`` a Spark DataFrame + label column to
run the same selection distributed.
"""

from __future__ import annotations

from .engine import PowerShapSelector


class PowerShap(PowerShapSelector):
    def __init__(
        self,
        model=None,
        power_iterations: int = 10,
        power_alpha: float = 0.01,
        val_size: float = 0.2,
        power_req_iterations: float = 0.99,
        include_all: bool = False,
        automatic: bool = True,
        force_convergence: bool = False,
        limit_convergence_its: int = 0,
        limit_automatic: int = 10,
        limit_incremental_iterations: int = 10,
        limit_recursive_automatic: int = 3,
        stratify: bool = False,
        cv=None,
        show_progress: bool = True,
        verbose: bool = False,
        **fit_kwargs,
    ):
        super().__init__(
            model=model,
            power_iterations=power_iterations,
            power_alpha=power_alpha,
            val_size=val_size,
            power_req_iterations=power_req_iterations,
            include_all=include_all,
            automatic=automatic,
            force_convergence=force_convergence,
            limit_convergence_its=limit_convergence_its,
            limit_automatic=limit_automatic,
            limit_incremental_iterations=limit_incremental_iterations,
            limit_recursive_automatic=limit_recursive_automatic,
            stratify=stratify,
            cv=cv,
            show_progress=show_progress,
            verbose=verbose,
            **fit_kwargs,
        )
