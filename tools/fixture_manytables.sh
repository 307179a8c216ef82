#!/bin/bash
# 100-table fixture for the per-table migration-floor measurement
# (round-18 task 1): `manysrc` holds N tiny tables (default 100,
# ~20 rows each), each with a PK, every 10th with an FK to its
# predecessor; `manydst` is the migration target. Idempotent.
set -e
cd "$(dirname "$0")/.."
N="${N:-100}"
PORT=54329
eval "$(bash tools/live_pg.sh | grep '^export')"
PSQL="su pguser -c"
for db in manysrc manydst; do
  $PSQL "psql -h 127.0.0.1 -p $PORT -U graft -d postgres -tc \
    \"SELECT 1 FROM pg_database WHERE datname='$db'\"" | grep -q 1 || \
    $PSQL "createdb -h 127.0.0.1 -p $PORT -U graft $db"
done
HAVE=$($PSQL "psql -h 127.0.0.1 -p $PORT -U graft -d manysrc -tc \
  \"SELECT count(*) FROM pg_tables WHERE schemaname='public'\"" | tr -d ' ')
if [ "$HAVE" != "$N" ]; then
  SQL=/tmp/manysrc_seed.sql
  {
    echo "DROP SCHEMA public CASCADE; CREATE SCHEMA public;"
    for i in $(seq 1 "$N"); do
      echo "CREATE TABLE t$i (id int PRIMARY KEY, name text NOT NULL, val numeric(10,2), ts timestamptz DEFAULT now());"
      echo "INSERT INTO t$i SELECT g, 'row_'||g, g*1.5, now() FROM generate_series(1,20) g;"
      echo "CREATE INDEX t${i}_name_idx ON t$i(name);"
      if [ $((i % 10)) -eq 0 ] && [ "$i" -gt 1 ]; then
        echo "ALTER TABLE t$i ADD COLUMN ref int REFERENCES t$((i-1))(id);"
        echo "UPDATE t$i SET ref = id;"
      fi
    done
    echo "VACUUM ANALYZE;"
  } > "$SQL"
  $PSQL "psql -h 127.0.0.1 -p $PORT -U graft -d manysrc -q -f $SQL"
  echo "seeded $N tables"
else
  echo "manysrc already has $N tables"
fi
