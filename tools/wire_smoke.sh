#!/bin/bash
# Wire-compatibility smoke: drive the engine's HTTP front the way the
# reference's docker harness does (docker/docker-compose.yml:1-75 —
# Telegraf writing v1 line protocol into the gateway), then round-trip a
# SELECT. Two tiers:
#
#   1. curl tier (always runs): v1 /write with a Telegraf-shaped gzip'd
#      line-protocol batch, v2 /api/v2/write with the precision param,
#      /ping, then /query SELECTs verified with python3.
#   2. docker tier (runs only where a docker daemon AND a telegraf image
#      are available; skipped cleanly otherwise): a REAL telegraf
#      process pointed at the port via outputs.influxdb.
#
# usage: tools/wire_smoke.sh   (requires compiled classes: sbt compile)
set -e
cd /root/repo
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

LOG=$(mktemp /tmp/wire_smoke.XXXXXX.log)
# pin the engine clock at 2025-01-01T00:00:00Z so relative-time queries
# over the fixed-timestamp smoke batch are reproducible
NOW_MS=1735689600000
java $ADD_OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.WireServer 0 "" $NOW_MS > "$LOG" 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null || true' EXIT

# wait for READY <port>
PORT=""
for _ in $(seq 1 120); do
  PORT=$(grep -m1 '^READY ' "$LOG" | awk '{print $2}' || true)
  [ -n "$PORT" ] && break
  sleep 0.5
done
[ -n "$PORT" ] || { echo "[wire] server never became ready"; tail -20 "$LOG"; exit 1; }
echo "[wire] server on port $PORT"

BASE="http://127.0.0.1:$PORT"

# --- ping ---
code=$(curl -s -o /dev/null -w '%{http_code}' "$BASE/ping")
[ "$code" = "204" ] || { echo "[wire] ping: $code != 204"; exit 1; }
echo "[wire] ping ok"

# --- v1 write: Telegraf output shape (gzip body, precision=ns default) ---
LP_V1='cpu,host=smoke1,region=eu usage_idle=93.5,usage_user=3.25 1735689540000000000
cpu,host=smoke2,region=us usage_idle=88.0,usage_user=7.5 1735689550000000000
mem,host=smoke1 used_percent=41.25 1735689540000000000'
code=$(printf '%s' "$LP_V1" | gzip -c | curl -s -o /dev/null -w '%{http_code}' \
  -XPOST -H 'Content-Encoding: gzip' --data-binary @- "$BASE/write?db=smoke")
[ "$code" = "204" ] || { echo "[wire] v1 write: $code != 204"; exit 1; }
echo "[wire] v1 write ok (gzip line protocol)"

series_count() { # ingested series via SHOW SERIES (the admission gate)
  curl -s "$BASE/query?db=${1:-smoke}" --data-urlencode "q=SHOW SERIES" \
    | python3 -c 'import json,sys
try:
    rs=json.load(sys.stdin)["results"][0]["series"]
    print(sum(len(s["values"]) for s in rs))
except Exception: print(0)' 2>/dev/null || echo 0
}

wait_series() { # the engine admits before ingesting; writes must not overlap
  for _ in $(seq 1 120); do
    [ "$(series_count "${2:-smoke}")" = "$1" ] && return 0
    sleep 1
  done
  echo "[wire] db ${2:-smoke} never reached $1 series (got $(series_count "${2:-smoke}"))"; exit 1
}
wait_series 3

# --- v2 write: /api/v2/write with bucket + precision=s ---
LP_V2='cpu,host=smoke3,region=ap usage_idle=71.0 1735689560'
code=$(printf '%s' "$LP_V2" | curl -s -o /dev/null -w '%{http_code}' \
  -XPOST --data-binary @- "$BASE/api/v2/write?bucket=smoke&precision=s")
[ "$code" = "204" ] || { echo "[wire] v2 write: $code != 204"; exit 1; }
echo "[wire] v2 write ok (bucket + precision=s)"
wait_series 4

# --- query round-trip: aggregate + tag filter + SHOW ---
# /write admits before ingesting (the reference's at-most-once posture),
# so poll until all three cpu points are queryable
QMEAN="q=SELECT mean(usage_idle) FROM cpu WHERE time > now() - 5m GROUP BY time(5m)"
Q1=$(curl -s "$BASE/query?db=smoke" --data-urlencode "$QMEAN")
Q2=$(curl -s "$BASE/query?db=smoke" --data-urlencode "q=SELECT usage_idle FROM cpu WHERE host = 'smoke3' AND time > now() - 5m")
Q3=$(curl -s "$BASE/query?db=smoke" --data-urlencode "q=SHOW MEASUREMENTS")
python3 - "$Q1" "$Q2" "$Q3" <<'EOF'
import json, sys
q1, q2, q3 = (json.loads(a) for a in sys.argv[1:4])
def all_series(resp):
    return [s for r in resp["results"] for s in r.get("series", [])]
# per-host means (the engine emits one series per tag group)
means = {s["tags"]["host"]: s["values"][0][-1]
         for s in all_series(q1) if "host" in s.get("tags", {})}
assert means == {"smoke1": 93.5, "smoke2": 88.0, "smoke3": 71.0}, means
# raw select fans out one series per tag key (host + region) — the same
# row appears under each of its tag groups; assert the distinct row
vals = {tuple(v) for s in all_series(q2) for v in s["values"]}
assert len(vals) == 1 and next(iter(vals))[-1] == 71.0, vals
names = {v[0] for s in all_series(q3) for v in s["values"]}
assert {"cpu", "mem"} <= names, names
print("[wire] query round-trip ok: per-host means over v1+v2 points, tag filter, SHOW MEASUREMENTS")
EOF

# --- Telegraf capture replay (round-9 verdict item 8): a stored batch in
# the exact public shape Telegraf's outputs.influxdb plugin emits —
# system plugins, i-suffix integer fields, a string field, an escaped
# tag value, the cpu-total pseudo-cpu — replayed through the same gzip'd
# v1 /write a Telegraf process would use, then verified field/tag/type-
# faithfully through SELECTs.
FIX=tools/fixtures/telegraf_capture.lp
code=$(gzip -c "$FIX" | curl -s -o /dev/null -w '%{http_code}' \
  -XPOST -H 'Content-Encoding: gzip' --data-binary @- "$BASE/write?db=tg")
[ "$code" = "204" ] || { echo "[wire] telegraf replay write: $code != 204"; exit 1; }
wait_series 8 tg
T1=$(curl -s "$BASE/query?db=tg" --data-urlencode "q=SELECT mean(usage_user) FROM cpu WHERE cpu = 'cpu-total' AND time > now() - 5m GROUP BY time(5m)")
T2=$(curl -s "$BASE/query?db=tg" --data-urlencode "q=SELECT count(usage_idle) FROM cpu WHERE cpu = 'cpu-total' AND time > now() - 5m GROUP BY time(5m)")
T3=$(curl -s "$BASE/query?db=tg" --data-urlencode "q=SELECT uptime_format FROM system WHERE time > now() - 5m")
T4=$(curl -s "$BASE/query?db=tg" --data-urlencode "q=SELECT used_percent FROM disk WHERE path = '/mnt/data vol' AND time > now() - 5m")
T5=$(curl -s "$BASE/query?db=tg" --data-urlencode "q=SELECT mean(used) FROM mem WHERE host = 'edge-01' AND time > now() - 5m GROUP BY time(5m)")
python3 - "$T1" "$T2" "$T3" "$T4" "$T5" <<'TGEOF'
import json, sys
t1, t2, t3, t4, t5 = (json.loads(a) for a in sys.argv[1:6])
def all_series(resp):
    return [s for r in resp["results"] for s in r.get("series", [])]
# tag-filtered per-host means over the replayed batch
means = {s["tags"]["host"]: s["values"][0][-1]
         for s in all_series(t1) if "host" in s.get("tags", {})}
assert means == {"edge-01": 5.0, "edge-02": 10.0}, means
# row counts per host (2 cpu-total points each)
counts = {s["tags"]["host"]: s["values"][0][-1]
          for s in all_series(t2) if "host" in s.get("tags", {})}
assert counts == {"edge-01": 2, "edge-02": 2}, counts
# string field survives as a string (Telegraf's uptime_format)
sv = {tuple(v) for s in all_series(t3) for v in s["values"]}
assert len(sv) == 1 and next(iter(sv))[-1] == "1 day, 0:00", sv
# escaped tag value (space) round-trips through write AND the WHERE
dv = {tuple(v) for s in all_series(t4) for v in s["values"]}
assert len(dv) == 1 and next(iter(dv))[-1] == 75.0, dv
# i-suffix integer field readable as numeric (the documented type policy)
mv = {s["values"][0][-1] for s in all_series(t5)}
assert mv == {7159980032.0}, mv
print("[wire] telegraf capture replay ok: means, counts, string field, escaped tag, int field")
TGEOF

# --- docker tier: a REAL telegraf if the environment has one ---
if docker info >/dev/null 2>&1 && docker image inspect telegraf >/dev/null 2>&1; then
  TCONF=$(mktemp /tmp/telegraf.XXXXXX.conf)
  cat > "$TCONF" <<CONF
[agent]
  interval = "1s"
  flush_interval = "1s"
[[inputs.cpu]]
[[outputs.influxdb]]
  urls = ["http://host.docker.internal:$PORT"]
  database = "smoke"
CONF
  docker run --rm -d --name graft-wire-telegraf --add-host=host.docker.internal:host-gateway \
    -v "$TCONF":/etc/telegraf/telegraf.conf:ro telegraf >/dev/null
  sleep 5
  docker stop graft-wire-telegraf >/dev/null
  N=$(curl -s "$BASE/query?db=smoke" --data-urlencode "q=SELECT count(usage_idle) FROM cpu" \
    | python3 -c 'import json,sys; r=json.load(sys.stdin); print(r["results"][0]["series"][0]["values"][0][1])')
  echo "[wire] docker telegraf tier ok (count=$N)"
else
  echo "[wire] docker tier SKIPPED (no docker daemon or telegraf image in this environment)"
fi

echo "[wire] SMOKE PASSED"
