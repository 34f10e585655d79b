"""Dict-of-lists logger with CSV round-trip.

Equivalent of the reference's legacy FnetLogger (fnet/fnetlogger.py:4-33,
exported by fnet/__init__.py but unused on the main path): accumulate row
dicts, dump/load as CSV. The main path logs through utils/tracking instead.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import pandas as pd


class CsvLogger:
    def __init__(self, path: Optional[str] = None, columns: Optional[Iterable[str]] = None):
        if path is not None:
            df = pd.read_csv(path)
            self.data = {c: list(df[c]) for c in df.columns}
        else:
            self.data = {c: [] for c in (columns or [])}

    def add(self, entry: Dict) -> None:
        for key, value in entry.items():
            self.data.setdefault(key, []).append(value)

    def to_csv(self, path: str) -> None:
        pd.DataFrame(self.data).to_csv(path, index=False)

    def __len__(self) -> int:
        return max((len(v) for v in self.data.values()), default=0)
