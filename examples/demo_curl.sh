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

# ---- round-2 surfaces ----

# vision chat (Qwen-VL checkpoints; image as data URI, video as base64)
curl -s http://localhost:8000/v1/chat/completions -H 'Content-Type: application/json' -d '{
  "model": "MODEL", "max_tokens": 128,
  "messages": [{"role": "user", "content": [
    {"type": "text", "text": "What is in this image?"},
    {"type": "image_url", "image_url": {"url": "data:image/png;base64,..."}}]}]}'

# audio chat (requires --stt-model; transcript is injected before templating)
curl -s http://localhost:8000/v1/chat/completions -H 'Content-Type: application/json' -d '{
  "model": "MODEL", "max_tokens": 128,
  "messages": [{"role": "user", "content": [
    {"type": "text", "text": "Summarize this recording:"},
    {"type": "input_audio", "input_audio": {"data": "<b64 wav>", "format": "wav"}}]}]}'

# text to speech (requires --tts-model, VITS/MMS checkpoints)
curl -s http://localhost:8000/v1/audio/speech -H 'Content-Type: application/json' \
  -d '{"input": "hello from the TPU", "voice": "0", "speed": 1.0}' -o out.wav

# constrained decoding: schema-valid by construction (FSM token masks)
curl -s http://localhost:8000/v1/chat/completions -H 'Content-Type: application/json' -d '{
  "model": "MODEL", "max_tokens": 128,
  "messages": [{"role": "user", "content": "Give me a user"}],
  "response_format": {"type": "json_schema", "json_schema": {"name": "user", "schema": {
    "type": "object", "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
    "required": ["name", "age"], "additionalProperties": false}}}}'

# profiling (requires --profile-dir)
curl -s -X POST http://localhost:8000/v1/profile/start
curl -s -X POST http://localhost:8000/v1/profile/stop

# Responses API with an image
curl -s http://localhost:8000/v1/responses -H 'Content-Type: application/json' -d '{
  "model": "MODEL", "input": [{"type": "message", "role": "user", "content": [
    {"type": "input_text", "text": "Describe:"},
    {"type": "input_image", "image_url": "data:image/png;base64,..."}]}]}'

# model workflow: convert to a pre-quantized TPU artifact, then register
# vllm-mlx-tpu model convert /ckpt /artifacts/model-int8 --quantize int8
# vllm-mlx-tpu model register /artifacts/model-int8 --served-model-name prod-model
# vllm-mlx-tpu model qualify prod-model --url http://localhost:8000

# serving flags tour:
#   --speculative-model DRAFT --num-speculative-tokens 3   # spec decoding
#   --specprefill-model DRAFT --specprefill-keep-pct 0.3   # sparse prefill
#   --kv-cache-dtype fp8_e4m3                              # quantized KV pool
#   --max-kv-size 8192                                     # rotating window
#   --kv-disk-cache-dir /cache                             # warm-restart KV
#   --dp-size 4                                            # DP replicas
#   --allow-remote-media                                   # SSRF-guarded URLs
