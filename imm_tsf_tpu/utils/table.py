"""Minimal ASCII table (PrettyTable replacement — the reference prints
dataset summaries and sweep timings with PrettyTable, e.g.
lib/parse_datasets.py:630-633, main_all.py:191-203)."""

from __future__ import annotations


class Table:
    def __init__(self, field_names):
        self.field_names = list(field_names)
        self.rows: list[list] = []

    def add_row(self, row):
        self.rows.append([str(c) for c in row])

    def __str__(self) -> str:
        cols = [self.field_names] + self.rows
        widths = [max(len(str(r[i])) for r in cols) for i in range(len(self.field_names))]
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        out = [sep]
        out.append("| " + " | ".join(
            str(h).ljust(w) for h, w in zip(self.field_names, widths)) + " |")
        out.append(sep)
        for r in self.rows:
            out.append("| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |")
        out.append(sep)
        return "\n".join(out)
