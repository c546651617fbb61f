#!/bin/bash
# 8B stacked-megakernel ablation matrix (sequential; each run compiles)
cd /root/repo
for args in "stacked" "stacked sabl=noattn" "stacked sabl=nokvdma" "stacked sch=1024"; do
  tag=$(echo "$args" | tr ' =' '__')
  echo "=== RUN [$args] $(date +%H:%M:%S) ===" 
  timeout 1500 python bench_8b.py $args > /root/repo/.bench_logs/8b_$tag.json 2> /root/repo/.bench_logs/8b_$tag.log
  echo "--- result [$args]:"
  cat /root/repo/.bench_logs/8b_$tag.json
done
echo "=== MATRIX DONE $(date +%H:%M:%S) ==="
