"""One-off extraction of the reference engine's embedded dimension data.

Reads the PUBLIC reference repo at /root/reference (read-only) and dumps its
static dimension tables (tax rates, exemptions, nexus thresholds, filing due
days, statutes of limitations, category aliases) to JSON seed files under
``tax_compliance_engine_spark/seeds/``.  This extracts *data* (tax facts), not
code; the Spark engine loads these seeds at runtime and never imports the
reference.

Sources (file:line in /root/reference):
  - state/local rates + exemptions: tax_engine/rates.py:63-764
  - category aliases:               tax_engine/calculator.py:96-113
  - nexus thresholds:               tax_engine/compliance.py:98-149
  - filing due days:                tax_engine/compliance.py:152-164
  - statutes of limitations:        tax_engine/refund_analyzer.py:71-92
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")

from tax_engine import calculator, compliance, rates, refund_analyzer  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tax_compliance_engine_spark" / "seeds"


def dump(name: str, rows: list) -> None:
    path = OUT / f"{name}.json"
    path.write_text(json.dumps(rows, indent=1, sort_keys=True) + "\n")
    print(f"{name}: {len(rows)} rows -> {path}")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    state_rows = []
    local_rows = []
    exemption_rows = []
    for code in sorted(rates._STATE_DATA):
        d = rates._STATE_DATA[code]
        state_rows.append(
            {
                "state_code": code,
                "state_name": d["name"],
                "base_rate": str(d["base_rate"]),
                "has_local_taxes": d["has_local"],
                "max_local_rate": str(d["max_local"]),
                "avg_combined_rate": str(d["avg_combined"]),
                "notes": d.get("notes", ""),
            }
        )
        for loc in d.get("locals", []):
            local_rows.append(
                {
                    "state_code": code,
                    "jurisdiction": loc.jurisdiction,
                    "county": loc.county,
                    "rate": str(loc.rate),
                    "jurisdiction_type": loc.jurisdiction_type,
                }
            )
        for ex in d.get("exemptions", []):
            exemption_rows.append({"state_code": code, "category": ex.value})

    dump("state_rates", state_rows)
    dump("local_rates", local_rows)
    dump("state_exemptions", exemption_rows)

    dump(
        "category_aliases",
        [
            {"alias": alias, "category": cat.value}
            for alias, cat in sorted(calculator._CATEGORY_MAP.items())
        ],
    )

    dump(
        "nexus_thresholds",
        [
            {
                "state_code": code,
                "revenue_threshold": str(d["revenue"]),
                "transaction_threshold": d["transactions"],
                "measurement_period": d["period"],
            }
            for code, d in sorted(compliance._NEXUS_THRESHOLDS.items())
        ],
    )
    dump(
        "no_nexus_states",
        [{"state_code": c} for c in sorted(compliance._NO_NEXUS_STATES)],
    )
    dump(
        "filing_due_day",
        [
            {"state_code": k, "due_day": v}
            for k, v in sorted(compliance._FILING_DUE_DAY.items())
            if k != "default"
        ],
    )
    dump(
        "sol_years",
        [
            {"state_code": k, "years": v}
            for k, v in sorted(refund_analyzer._STATUTE_OF_LIMITATIONS.items())
            if k != "default"
        ],
    )


if __name__ == "__main__":
    main()
