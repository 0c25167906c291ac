"""Result-equivalence harness for the optimization round.

  python tools/verify_equiv.py save <tag> [sf_dir] [q1 q2 ...]
      collect each query's full result (sorted rows + schema) and pickle
      it under /tmp/equiv_<tag>/
  python tools/verify_equiv.py check <tag> [sf_dir] [q1 q2 ...]
      re-run and compare against the saved snapshot; prints PASS/FAIL per
      query with the first differing row.

Rows are compared exactly (no float rounding): an optimization must be
bit-identical, not merely close.
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def snap(df):
    rows = [tuple(r) for r in df.collect()]
    rows.sort(key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))
    return {"schema": df.schema.jsonValue(), "rows": rows}


def main() -> None:
    cmd, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    import __spark_entry__ as entry
    from tools.profile_r06 import get_session

    spark = get_session()
    qs = entry.queries()
    names = names or list(qs)
    d = f"/tmp/equiv_{tag}"
    os.makedirs(d, exist_ok=True)

    failures = []
    for name in names:
        s = snap(qs[name](spark, sf_dir))
        p = os.path.join(d, f"{name}.pkl")
        if cmd == "save":
            with open(p, "wb") as f:
                pickle.dump(s, f)
            print(f"saved {name} ({len(s['rows'])} rows)", flush=True)
        else:
            with open(p, "rb") as f:
                ref = pickle.load(f)
            ok = ref == s
            if not ok:
                failures.append(name)
                detail = ""
                if ref["schema"] != s["schema"]:
                    detail = "SCHEMA DIFF"
                else:
                    for a, b in zip(ref["rows"], s["rows"]):
                        if a != b:
                            detail = f"first diff: {a!r} != {b!r}"
                            break
                    else:
                        detail = f"row count {len(ref['rows'])} != {len(s['rows'])}"
                print(f"FAIL {name}: {detail}", flush=True)
            else:
                print(f"PASS {name} ({len(s['rows'])} rows)", flush=True)
    if cmd == "check":
        print("FAILURES:", failures if failures else "none")
        sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
