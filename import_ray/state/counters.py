"""Counter / report framework — the reference's LogWrapper semantics
(util/src/main/java/org/datacommons/util/LogWrapper.java:45-310):

- per-level counter maps; ≤30 exemplar messages per counter
  (java:50-51); report aborts when any FATAL or >50 distinct error
  counters (java:204-214);
- ``report.json`` shape matches the reference's golden reports
  (levelSummary.{LEVEL}.counters → stringified counts, entries list).

Dataflow: each check kernel returns per-batch ``CounterBatch`` dicts;
they are merged associatively (sum counts, concat-capped exemplars) —
a driver-side reduce over a tiny side channel, or
``Dataset.aggregate`` when counters ride along as rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

LEVEL_INFO = "LEVEL_INFO"
LEVEL_WARNING = "LEVEL_WARNING"
LEVEL_ERROR = "LEVEL_ERROR"
LEVEL_FATAL = "LEVEL_FATAL"

MAX_MESSAGES_PER_COUNTER = 30  # LogWrapper.java:50
MAX_ERROR_COUNTERS = 50  # LogWrapper.java:51


@dataclass
class CounterSet:
    """Mergeable counter accumulator."""

    # (level, counter) -> count
    counts: dict = field(default_factory=dict)
    # (level, counter) -> [(message, file, line)] capped
    exemplars: dict = field(default_factory=dict)

    def add(
        self,
        level: str,
        counter: str,
        message: str = "",
        file: str = "",
        line: int = 0,
        n: int = 1,
    ) -> None:
        key = (level, counter)
        self.counts[key] = self.counts.get(key, 0) + n
        if message:
            ex = self.exemplars.setdefault(key, [])
            if len(ex) < MAX_MESSAGES_PER_COUNTER:
                ex.append((message, file, line))

    def merge(self, other: "CounterSet") -> "CounterSet":
        for key, n in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + n
        for key, ex in other.exemplars.items():
            mine = self.exemplars.setdefault(key, [])
            take = MAX_MESSAGES_PER_COUNTER - len(mine)
            if take > 0:
                mine.extend(ex[:take])
        return self

    def counter(self, name: str) -> int:
        return sum(n for (lvl, c), n in self.counts.items() if c == name)

    def level_counters(self, level: str) -> dict[str, int]:
        return {c: n for (lvl, c), n in self.counts.items() if lvl == level}

    def too_many_failures(self) -> bool:
        """LogWrapper.java:204-214 abort condition."""
        if self.level_counters(LEVEL_FATAL):
            return True
        return len(self.level_counters(LEVEL_ERROR)) > MAX_ERROR_COUNTERS

    def to_report(self) -> dict:
        level_summary: dict = {}
        for (level, counter), n in sorted(self.counts.items()):
            level_summary.setdefault(level, {"counters": {}})["counters"][counter] = str(
                n
            )
        entries = []
        for (level, counter), ex in sorted(self.exemplars.items()):
            for message, file, line in ex:
                entries.append(
                    {
                        "level": level,
                        "location": {"file": file, "lineNumber": str(line)},
                        "userMessage": message,
                        "counterKey": counter,
                    }
                )
        return {"levelSummary": level_summary, "entries": entries}

    def write_report(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_report(), f, indent=2, sort_keys=True)

    # --- Arrow interchange (ride counters through Dataset ops) -----------
    def to_rows(self) -> list[dict]:
        rows = []
        for (level, counter), n in self.counts.items():
            ex = self.exemplars.get((level, counter), [])
            rows.append(
                {
                    "level": level,
                    "counter": counter,
                    "count": n,
                    "exemplars": json.dumps(ex[:MAX_MESSAGES_PER_COUNTER]),
                }
            )
        return rows

    @staticmethod
    def from_rows(rows) -> "CounterSet":
        cs = CounterSet()
        for r in rows:
            key = (r["level"], r["counter"])
            cs.counts[key] = cs.counts.get(key, 0) + int(r["count"])
            ex = cs.exemplars.setdefault(key, [])
            for m in json.loads(r["exemplars"]):
                if len(ex) < MAX_MESSAGES_PER_COUNTER:
                    ex.append(tuple(m))
        return cs


def issues_to_counterset(issues, level_fn=None) -> CounterSet:
    """Convert ParseIssue lists (parser/mutator/resolver) to counters."""
    cs = CounterSet()
    for i in issues:
        level = level_fn(i) if level_fn else LEVEL_ERROR
        cs.add(level, i.counter, str(i), getattr(i, "node_id", ""), getattr(i, "line_num", 0))
    return cs
