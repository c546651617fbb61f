#!/bin/bash
# round-5: int4 weight A/B + int8-KV A/B at 8B geometry (sequential)
cd /root/repo
for args in "int4" "4 32 int8"; do
  tag=$(echo "r5_$args" | tr ' =' '__')
  echo "=== RUN [$args] $(date +%H:%M:%S) ==="
  timeout 2400 python bench_8b.py $args > /root/repo/.bench_logs/8b_$tag.json 2> /root/repo/.bench_logs/8b_$tag.log
  echo "--- result [$args]:"; cat /root/repo/.bench_logs/8b_$tag.json
done
echo "=== R5A DONE $(date +%H:%M:%S) ==="
