from .numerics import (
    betainc_reg,
    nct_cdf,
    percentileofscore_rank,
    solve_power_nobs,
    t_cdf,
    t_ppf,
    ttest_power_smaller,
)

__all__ = [
    "betainc_reg",
    "nct_cdf",
    "percentileofscore_rank",
    "solve_power_nobs",
    "t_cdf",
    "t_ppf",
    "ttest_power_smaller",
]
