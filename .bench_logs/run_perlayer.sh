#!/bin/bash
cd /root/repo
for args in "" "noattn" "dummyattn"; do
  tag=perlayer_$(echo "x$args" | tr ' =' '__')
  echo "=== RUN perlayer [$args] $(date +%H:%M:%S) ==="
  timeout 1500 python bench_8b.py $args > /root/repo/.bench_logs/8b_$tag.json 2> /root/repo/.bench_logs/8b_$tag.log
  echo "--- result [$args]:"; cat /root/repo/.bench_logs/8b_$tag.json
done
echo "=== DONE $(date +%H:%M:%S) ==="
