#!/bin/bash
# round-5: fused-KV-write A/B at 8B geometry (same session, sequential)
cd /root/repo
for args in "" "nofusedkv"; do
  tag=$(echo "r5b_x$args" | tr ' =' '__')
  echo "=== RUN [$args] $(date +%H:%M:%S) ==="
  timeout 2400 python bench_8b.py $args > /root/repo/.bench_logs/8b_$tag.json 2> /root/repo/.bench_logs/8b_$tag.log
  echo "--- result [$args]:"; cat /root/repo/.bench_logs/8b_$tag.json
done
echo "=== R5B DONE $(date +%H:%M:%S) ==="
