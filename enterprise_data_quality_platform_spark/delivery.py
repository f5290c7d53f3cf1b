"""HTTP alert delivery — the wire half of the alert lifecycle (S4-S6).

``alerts.py`` models fan-out as queryable rows; this module is the
downstream consumer that actually delivers them, reproducing the
reference's three payload shapes byte-for-field:

- PagerDuty Events v1 ``create_event`` (service_key/event_type/
  description/client/details — ``/root/reference/airflow/dags/
  pager-workflow.py:15-27``, resolve via ``update-pager-duty.yml``);
- LLM-agent run message (agent_name + parts[] with text/plain content —
  ``pager-workflow.py:69-84``);
- GitHub ``repository_dispatch`` (event_type + client_payload with the
  failure details and the PagerDuty incident key —
  ``test-pager-action.py:64-93``).

Transport is pluggable: ``HttpTransport`` (urllib POST, bounded retries
with exponential backoff — stdlib only), ``FileTransport`` (JSONL spool
for air-gapped runs; a later relay drains it), ``MemoryTransport``
(tests). Endpoints and credentials come from ``DeliveryConfig`` — nothing
is hardcoded beyond the public SaaS API URLs the reference itself posts
to.

Delivery is idempotent end-to-end: alert rows carry deterministic
incident keys (see ``alerts.py``), every payload embeds that key, and
PagerDuty/GitHub treat it as the dedup key — re-delivering after a crash
re-sends the same logical event, which the receivers collapse. At scale
delivery volume is |failed checks|, not |rows| — this never needs to be
distributed; it drains a KB-sized alerts table from the driver.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Callable, Iterable, Mapping, Protocol

#: public API endpoints used by the reference (pager-workflow.py:31,
#: test-pager-action.py:73); override per-config for proxies/mocks.
PAGERDUTY_EVENTS_URL = "https://events.pagerduty.com/generic/2010-04-15/create_event.json"
GITHUB_DISPATCH_URL = "https://api.github.com/repos/{repo}/dispatches"


@dataclass
class DeliveryConfig:
    pagerduty_key: str | None = None
    pagerduty_url: str = PAGERDUTY_EVENTS_URL
    agent_name: str | None = None
    agent_token: str | None = None
    agent_url: str | None = None  # the reference's Chicory runs endpoint
    github_repo: str | None = None  # "owner/repo"
    github_token: str | None = None
    github_url: str = GITHUB_DISPATCH_URL
    client_name: str = "enterprise_data_quality_platform_spark"


class Transport(Protocol):
    def post(self, url: str, payload: dict, headers: Mapping[str, str]) -> dict: ...


class HttpTransport:
    """stdlib urllib POST with bounded retries + exponential backoff.

    Retries only on transport errors and 5xx (4xx is a payload/auth
    problem — retrying can only duplicate noise)."""

    def __init__(self, retries: int = 3, backoff_s: float = 1.0, timeout_s: float = 10.0):
        self.retries = retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s

    def post(self, url: str, payload: dict, headers: Mapping[str, str]) -> dict:
        body = json.dumps(payload).encode()
        last: Exception | None = None
        for attempt in range(self.retries):
            req = urllib.request.Request(
                url,
                data=body,
                headers={"Content-Type": "application/json", **headers},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    text = resp.read().decode() or "{}"
                    try:
                        out = json.loads(text)
                    except ValueError:
                        out = {"raw": text}
                    # a valid JSON array/scalar body is still a 2xx success
                    if not isinstance(out, dict):
                        out = {"raw": out}
                    out["_status"] = resp.status
                    return out
            except urllib.error.HTTPError as exc:
                if exc.code < 500:
                    raise
                last = exc
            except (urllib.error.URLError, OSError) as exc:
                last = exc
            time.sleep(self.backoff_s * (2**attempt))
        raise RuntimeError(f"delivery failed after {self.retries} attempts: {last}")


class FileTransport:
    """JSONL spool: one line per attempted POST — the air-gapped/daily-
    digest mode, and the durable outbox a relay process drains."""

    def __init__(self, path: str):
        self.path = path

    def post(self, url: str, payload: dict, headers: Mapping[str, str]) -> dict:
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"url": url, "payload": payload}) + "\n")
        return {"_status": 0, "spooled": True}


class MemoryTransport:
    def __init__(self, responses: dict | None = None):
        self.sent: list[tuple[str, dict, dict]] = []
        self.responses = responses or {}

    def post(self, url: str, payload: dict, headers: Mapping[str, str]) -> dict:
        self.sent.append((url, payload, dict(headers)))
        return {**self.responses, "_status": 200}


# ----------------------------------------------------------- payload builders


def pagerduty_payload(cfg: DeliveryConfig, error_details: Mapping) -> dict:
    """pager-workflow.py:15-27, field-for-field; incident_key added so
    PagerDuty dedups retries against our deterministic key."""
    return {
        "service_key": cfg.pagerduty_key,
        "event_type": "trigger",
        "incident_key": error_details.get("incident_key"),
        "description": (
            f"Pipeline Validation Failed: {error_details.get('task', error_details.get('check_name'))}"
        ),
        "client": cfg.client_name,
        "details": {
            "pipeline_name": error_details.get("pipeline"),
            "failed_task": error_details.get("task"),
            "error_message": error_details.get("error"),
            "failed_validations": list(error_details.get("failed_validations", [])),
            "timestamp": error_details.get("timestamp"),
        },
    }


def pagerduty_resolve_payload(cfg: DeliveryConfig, incident_key: str) -> dict:
    """The resolve half the reference fires from CI hooks
    (update-pager-duty.yml): same endpoint, event_type=resolve."""
    return {
        "service_key": cfg.pagerduty_key,
        "event_type": "resolve",
        "incident_key": incident_key,
    }


def agent_payload(cfg: DeliveryConfig, error_details: Mapping, incident_key: str | None, created_at: str) -> dict:
    """pager-workflow.py:69-84: one text/plain part summarizing the failure."""
    msg = (
        f"Pipeline failure in {error_details.get('pipeline')}"
        f" - Task: {error_details.get('task')}"
        f" - Error: {error_details.get('error')}"
        f" - Failed validations: {list(error_details.get('failed_validations', []))}"
        f" - Timestamp: {error_details.get('timestamp')}"
        f" - PagerDuty incident: {incident_key}"
    )
    return {
        "agent_name": cfg.agent_name,
        "input": [
            {
                "parts": [{"content_type": "text/plain", "content": msg}],
                "created_at": created_at,
            }
        ],
    }


def github_dispatch_payload(error_details: Mapping, incident_key: str | None) -> dict:
    """test-pager-action.py:64-71: repository_dispatch with the failure
    and the PagerDuty key in client_payload."""
    return {
        "event_type": "airflow-failure",
        "client_payload": {
            "pipeline_failure": dict(error_details),
            "pagerduty_incident_key": incident_key,
            "timestamp": error_details.get("timestamp"),
        },
    }


# ------------------------------------------------------------------ delivery


def deliver_alert_rows(
    rows: Iterable[Mapping],
    cfg: DeliveryConfig,
    transport: Transport | None = None,
    now_iso: Callable[[], str] | None = None,
) -> list[dict]:
    """Deliver alert-table rows (see ``alerts.ALERT_SCHEMA``) over their
    channels. Returns one receipt per row: {incident_key, channel, url,
    status|error}. A failed channel never blocks the others — the
    reference continues to the agent/GitHub when PagerDuty fails
    (pager-workflow.py:55-58)."""
    from datetime import datetime, timezone

    tp = transport or HttpTransport()
    stamp = now_iso or (lambda: datetime.now(timezone.utc).isoformat())
    receipts: list[dict] = []
    for row in rows:
        key = row.get("incident_key")
        channel = row.get("channel", "pagerduty")
        details = {
            "incident_key": key,
            "pipeline": row.get("service"),
            "task": row.get("check_name"),
            "check_name": row.get("check_name"),
            "error": row.get("message"),
            "failed_validations": [row.get("check_name")],
            "timestamp": str(row.get("created_ts", "")),
        }
        try:
            if channel == "pagerduty":
                url = cfg.pagerduty_url
                if row.get("action") == "resolve":
                    payload = pagerduty_resolve_payload(cfg, key)
                else:
                    payload = pagerduty_payload(cfg, details)
                out = tp.post(url, payload, {})
            elif channel == "agent":
                url = cfg.agent_url or ""
                payload = agent_payload(cfg, details, key, stamp())
                out = tp.post(
                    url, payload, {"Authorization": f"Bearer {cfg.agent_token}"}
                )
            elif channel == "github":
                url = cfg.github_url.format(repo=cfg.github_repo)
                payload = github_dispatch_payload(details, key)
                out = tp.post(
                    url,
                    payload,
                    {
                        "Authorization": f"token {cfg.github_token}",
                        "Accept": "application/vnd.github.v3+json",
                    },
                )
            else:
                raise ValueError(f"unknown channel: {channel}")
            receipts.append(
                {"incident_key": key, "channel": channel, "url": url,
                 "status": out.get("_status")}
            )
        except Exception as exc:  # noqa: BLE001 — per-channel isolation
            receipts.append(
                {"incident_key": key, "channel": channel, "error": str(exc)}
            )
    return receipts
