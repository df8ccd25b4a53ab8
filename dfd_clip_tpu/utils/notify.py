"""Completion notification hook (reference src/tools/notify.py:6-13)."""

from __future__ import annotations

import json
import logging
import os
import urllib.request


def send_to_telegram(message: str) -> None:
    token = os.environ.get("API_TOKEN")
    chat_id = os.environ.get("CHAT_ID")
    if not token or not chat_id:
        return
    try:
        req = urllib.request.Request(
            f"https://api.telegram.org/bot{token}/sendMessage",
            data=json.dumps({"chat_id": chat_id, "text": message}).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=10)
    except Exception as e:  # notification is best-effort
        logging.warning("telegram notify failed: %s", e)
