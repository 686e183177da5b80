"""ErrorBag-shaped result accessors.

Re-expresses the reference's ErrorBag semantics (/root/reference/src/index.ts:14-56)
over *collected* violation rows, so the pytest parity suite can assert the exact
behaviors the reference's vitest specs assert:

- field issues: ordered list of {key, message} (src/index.ts:23-26)
- global error: single string, last-write-wins (src/index.ts:18-21); under the
  engine's fail-fast compilation at most one rule emits, so "last wins" within a
  rule is modeled by emission order (the last global emission of the failing rule).
- first_error(key): first message for key in insertion order (src/index.ts:32-34)
- has_errors(): any issue OR global set (src/index.ts:36-38)
- to_object(): {global, issues: {key: [messages...]}} grouped in insertion order
  (src/index.ts:40-55)

Insertion order == (rule_idx, seq) — the deterministic sort keys the engine
attaches to every violation row (SURVEY.md §2.B B11/B13).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ErrorBag:
    """Driver-side violation accumulator for one logical record (row)."""

    issues: list[tuple[str, str]] = field(default_factory=list)  # (key, message)
    global_error: str | None = None

    @classmethod
    def from_rows(cls, rows) -> "ErrorBag":
        """Build from collected violation rows ordered by (rule_idx, seq).

        Rows with key IS NULL are global-error emissions (last one wins,
        mirroring addGlobalError overwrite at src/index.ts:18-21).
        """
        bag = cls()
        ordered = sorted(rows, key=lambda r: (r["rule_idx"], r["seq"]))
        for r in ordered:
            if r["key"] is None:
                bag.global_error = r["message"]
            else:
                bag.issues.append((r["key"], r["message"]))
        return bag

    def add_error(self, key: str, message: str) -> None:
        self.issues.append((key, message))

    def add_global_error(self, message: str) -> None:
        self.global_error = message

    def first_error(self, key: str) -> str | None:
        for k, m in self.issues:
            if k == key:
                return m
        return None

    def has_errors(self) -> bool:
        return bool(self.issues) or self.global_error is not None

    def to_object(self) -> dict:
        grouped: dict[str, list[str]] = {}
        for k, m in self.issues:
            grouped.setdefault(k, []).append(m)
        return {"global": self.global_error, "issues": grouped}
