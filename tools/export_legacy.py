#!/usr/bin/env python3
"""Dev-side export of the reference's legacy SQLite dataset to JSONL test
fixtures (src/test/resources/legacy/). The container ships no SQLite JDBC
driver for Spark, so the golden ingest test reads these JSONL files
instead; at deployment the same ingest binds to a JDBC source (S1).

Usage: python3 tools/export_legacy.py
"""
import json, sqlite3, os

SRC = "/root/reference/sqlite_to_postgresql/db.sqlite"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "legacy")

def main():
    os.makedirs(DST, exist_ok=True)
    con = sqlite3.connect(SRC)
    con.row_factory = sqlite3.Row
    for table in ["movies", "actors", "writers", "movie_actors"]:
        rows = con.execute(f"SELECT * FROM {table}").fetchall()
        with open(os.path.join(DST, f"{table}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(dict(r), ensure_ascii=False) + "\n")
        print(f"{table}: {len(rows)} rows")

if __name__ == "__main__":
    main()
