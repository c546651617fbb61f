# SPDX-License-Identifier: Apache-2.0
"""Audio tower: STT (Whisper), TTS, mel frontend."""
