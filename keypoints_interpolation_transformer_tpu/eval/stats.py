"""Statistical comparison and plotting of loss distributions.

The reference's statistical-validation-as-testing layer: ANOVA F-test +
Tukey HSD + t-test over {baseline, model, cubic} loss lists
(utils.py:283-298, 3_test_cubic_interpolation.py:179-196) and violin plots
(utils.py:245-278).  scipy/matplotlib are optional — results always come
back as a dict.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional


def compare_distributions(losses: Dict[str, List[float]],
                          plot_path: Optional[str] = None,
                          verbose: bool = True) -> dict:
    names = list(losses)
    groups = [losses[n] for n in names]
    out: dict = {"groups": names}

    try:
        from scipy.stats import f_oneway, ttest_ind, tukey_hsd
        f_stat, p_value = f_oneway(*groups)
        out["anova"] = {"f": float(f_stat), "p": float(p_value),
                        "significant": bool(p_value < 0.05)}
        if len(groups) >= 2:
            tk = tukey_hsd(*groups)
            out["tukey_pvalues"] = tk.pvalue.tolist()
            t_stat, t_p = ttest_ind(groups[0], groups[-1])
            out["ttest_first_vs_last"] = {"t": float(t_stat),
                                          "p": float(t_p)}
        if verbose:
            print(f"F-statistic: {f_stat}, p-value: {p_value}")
            for i, n in enumerate(names):
                print(f"{i}) {n}")
            print(tk)
    except ImportError:
        out["anova"] = None

    if plot_path:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(8, 6))
            violins = ax.violinplot(groups, showmedians=True)
            for body, name in zip(violins["bodies"], names):
                body.set_alpha(0.7)
                body.set_label(name)
            ax.grid(axis="y", linestyle="--", alpha=0.7)
            ax.set_title("Loss comparison")
            ax.set_xlabel("Algorithm")
            ax.set_ylabel("Loss")
            ax.set_xticks(range(1, len(names) + 1), names)
            os.makedirs(os.path.dirname(plot_path) or ".", exist_ok=True)
            fig.savefig(plot_path)
            plt.close(fig)
            out["plot"] = plot_path
        except ImportError:
            pass
    return out
