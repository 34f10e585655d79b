"""Per-task / overall metric aggregation and CSV export.

Mirrors the reference's pandas aggregation in run_eval (main.py:299-322):
per-volume rows -> groupby(dataset).mean -> overall mean, written as
comp_/spec_/final_ CSVs with the same schema so downstream tooling keeps
working.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import pandas as pd


class MetricAggregator:
    def __init__(self):
        self.rows: List[Dict] = []

    def add(self, dataset: str, path_czi: str, stats: Dict[str, float]):
        self.rows.append({"dataset": dataset, "path_czi": path_czi, **stats})

    def frames(self):
        """(comp, spec, final) DataFrames, reference column conventions."""
        comp = pd.DataFrame(self.rows)
        comp.insert(
            loc=2, column="img_id", value=[f"{i:0>3d}" for i in range(len(comp))]
        )
        spec = comp.groupby("dataset").mean(numeric_only=True)
        final = comp.mean(numeric_only=True).to_frame().T
        spec = spec.reset_index()  # dataset column first (main.py:311-312)
        return comp, spec, final

    def log_dict(self, eval_type: str, epoch: Optional[int] = None) -> Dict[str, float]:
        """Flat metric dict, reference key naming (main.py:305-309)."""
        comp, spec, final = self.frames()
        out: Dict[str, float] = {}
        if epoch is not None:
            out["X-axis/epoch"] = epoch + 1
        for column in final.columns:
            out[f"metric_{eval_type}/{column}"] = float(final.iloc[0][column])
            for _, row in spec.iterrows():
                out[f"metric_{eval_type}_{column}/{row['dataset']}"] = float(
                    row[column]
                )
        return out

    def to_csvs(self, metric_dir: str, exp_name: str):
        """comp_/spec_/final_ CSVs (main.py:319-322)."""
        comp, spec, final = self.frames()
        os.makedirs(metric_dir, exist_ok=True)
        comp.to_csv(os.path.join(metric_dir, f"comp_{exp_name}.csv"), index=False)
        spec.to_csv(os.path.join(metric_dir, f"spec_{exp_name}.csv"), index=False)
        final.to_csv(os.path.join(metric_dir, f"final_{exp_name}.csv"), index=False)
