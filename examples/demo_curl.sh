#!/usr/bin/env bash
# SPDX-License-Identifier: Apache-2.0
# curl demos for every API family (parity with the reference's
# examples/demo_curl_text.sh). Start a server first:
#   vllm-mlx-tpu serve /path/to/checkpoint --port 8000
set -euo pipefail
BASE=${BASE:-http://localhost:8000}
MODEL=$(curl -s $BASE/v1/models | python3 -c 'import json,sys; print(json.load(sys.stdin)["data"][0]["id"])')

echo "== health =="
curl -s $BASE/health | python3 -m json.tool

echo "== chat completion =="
curl -s $BASE/v1/chat/completions -H 'Content-Type: application/json' -d "{
  \"model\": \"$MODEL\",
  \"messages\": [{\"role\": \"user\", \"content\": \"Say hello in French.\"}],
  \"max_tokens\": 50
}" | python3 -m json.tool

echo "== streaming (SSE) =="
curl -sN $BASE/v1/chat/completions -H 'Content-Type: application/json' -d "{
  \"model\": \"$MODEL\",
  \"messages\": [{\"role\": \"user\", \"content\": \"Count to 5.\"}],
  \"max_tokens\": 40, \"stream\": true
}" | head -20

echo "== anthropic messages =="
curl -s $BASE/v1/messages -H 'Content-Type: application/json' -d "{
  \"model\": \"$MODEL\",
  \"max_tokens\": 50,
  \"messages\": [{\"role\": \"user\", \"content\": \"Say hello.\"}]
}" | python3 -m json.tool

echo "== responses api =="
curl -s $BASE/v1/responses -H 'Content-Type: application/json' -d "{
  \"model\": \"$MODEL\", \"input\": \"What is 2+2?\", \"max_output_tokens\": 30
}" | python3 -m json.tool

echo "== status / cache =="
curl -s $BASE/v1/status | python3 -m json.tool
curl -s $BASE/v1/cache/stats | python3 -m json.tool
