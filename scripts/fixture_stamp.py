#!/usr/bin/env python3
"""Fixture integrity stamp (round-16, verdict item 2).

The sweep ladder's comparability rests on GENERATOR-PINNED fixtures
(/tmp/sf1, /tmp/sf10, /tmp/sf100 + /root/testdata/sf*): regenerating one
changes parquet row-group layout and moved scan-bound gates up to 11x in
round 14 — silently, because nothing recorded WHICH bytes a bench ran
against. This module computes a cheap filesystem fingerprint (per-table
file count + total bytes, md5 over the sorted manifest) that every bench
/ check artifact embeds, and that scale_curve.py verifies before
dividing numbers. graft.Bench computes the SAME stamp in Scala
(stampFixture) — the two must stay algorithm-identical:

  tables  = top-level entries of sf_dir, sorted by name
  per table: regular-file count + byte sum (for directories: recursive,
             skipping basenames starting with '.' or '_')
  fingerprint = md5(";".join(f"{name}:{files}:{bytes}"))

Run as a script to print the stamp of a dir, or with --pin to write/merge
scripts/FIXTURE_STAMPS.json (the committed pin set).
"""
import hashlib, json, os, sys

PIN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "FIXTURE_STAMPS.json")


def stamp(sf_dir):
    sf_dir = os.path.normpath(sf_dir)
    tables = {}
    for name in sorted(os.listdir(sf_dir)):
        p = os.path.join(sf_dir, name)
        if os.path.isfile(p):
            tables[name] = {"files": 1, "bytes": os.path.getsize(p)}
        elif os.path.isdir(p):
            files, total = 0, 0
            for root, _, fnames in os.walk(p):
                for f in fnames:
                    if f.startswith(".") or f.startswith("_"):
                        continue
                    files += 1
                    total += os.path.getsize(os.path.join(root, f))
            tables[name] = {"files": files, "bytes": total}
    manifest = ";".join(f"{n}:{t['files']}:{t['bytes']}"
                        for n, t in sorted(tables.items()))
    return {"dir": sf_dir,
            "fingerprint": hashlib.md5(manifest.encode()).hexdigest(),
            "tables": tables}


def load_pins():
    if os.path.exists(PIN_FILE):
        return json.load(open(PIN_FILE))
    return {}


def check_pin(sf_dir, fingerprint=None, who="artifact"):
    """Compare a fingerprint (or the live dir's) against the committed
    pin. Returns (ok, message); unknown dirs are ok-with-note so ad-hoc
    fixtures never block."""
    pins = load_pins()
    sf_dir = os.path.normpath(sf_dir)
    if sf_dir not in pins:
        return True, f"{who}: {sf_dir} has no committed pin (ad-hoc fixture)"
    fp = fingerprint or stamp(sf_dir)["fingerprint"]
    if fp == pins[sf_dir]["fingerprint"]:
        return True, f"{who}: {sf_dir} matches pinned fixture"
    return False, (f"{who}: {sf_dir} fingerprint {fp} != pinned "
                   f"{pins[sf_dir]['fingerprint']} — the fixture was "
                   "REGENERATED since the pin; numbers are not comparable "
                   "across the regeneration (row-group layout moved gates "
                   "up to 11x in round 14). Re-pin deliberately with "
                   "fixture_stamp.py --pin <dir> if the new fixture is "
                   "intended.")


def main():
    if "--pin" in sys.argv:
        dirs = [a for a in sys.argv[1:] if a != "--pin"]
        pins = load_pins()
        for d in dirs:
            s = stamp(d)
            pins[s["dir"]] = {"fingerprint": s["fingerprint"],
                              "tables": s["tables"]}
            print(f"pinned {s['dir']} -> {s['fingerprint']}")
        json.dump(pins, open(PIN_FILE, "w"), indent=1)
        print(f"wrote {PIN_FILE}")
        return
    for d in sys.argv[1:]:
        s = stamp(d)
        ok, msg = check_pin(d, s["fingerprint"], who="live dir")
        print(json.dumps(s, indent=1))
        print(msg)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
