"""Failure alerting (SURVEY.md §2.8 M5) — port of the reference's
SMTP admin alert (/root/reference/utils/email_utils.py:11-74):
env-config-gated, missing config means "log and skip", never raise.
The SMTP client is injectable so tests (and this no-network container)
exercise the full path with a fake transport.
"""

from __future__ import annotations

import os
import smtplib
from collections.abc import Callable
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from finance_pipeline_spark.logging_utils import get_logger

log = get_logger(__name__)

_REQUIRED = (
    "EMAIL_ADDRESS",
    "EMAIL_PASSWORD",
    "RECIPIENT_EMAIL",
    "SMTP_SERVER",
    "SMTP_PORT",
)


def _smtp_send(server: str, port: int, sender: str, password: str, msg) -> None:
    with smtplib.SMTP(server, port) as smtp:
        smtp.starttls()
        smtp.login(sender, password)
        smtp.send_message(msg)


def alert_admin(
    message: str,
    subject: str = "Alerte ETL",
    send: Callable | None = None,
    env: dict | None = None,
) -> bool:
    """Send an alert email; returns False (after logging) on missing
    config or transport failure — alerting must never take the
    pipeline down (utils/email_utils.py:42-45,66-74)."""
    log.error("ALERT ADMIN: %s", message)
    env = env if env is not None else dict(os.environ)
    missing = [k for k in _REQUIRED if not env.get(k)]
    if missing:
        log.warning("Missing email configuration: %s. Alert not sent.", missing)
        return False
    msg = MIMEMultipart()
    msg["From"] = env["EMAIL_ADDRESS"]
    msg["To"] = env["RECIPIENT_EMAIL"]
    msg["Subject"] = subject
    msg.attach(MIMEText(message))
    try:
        (send or _smtp_send)(
            env["SMTP_SERVER"],
            int(env["SMTP_PORT"]),
            env["EMAIL_ADDRESS"],
            env["EMAIL_PASSWORD"],
            msg,
        )
        log.info("Alert email sent successfully.")
        return True
    except Exception as e:  # noqa: BLE001 — alert path must not raise
        log.error("Failed to send alert email: %s", e)
        return False
