"""Scheduler surface: persistent cron jobs re-running the pipeline.

Ports the reference's SchedulerManager (scheduler_manager.py:28-261):
a JSON-persisted job list (id / name / type / cron_expression / stage /
created / next_run), add/remove/clear/list, a pipeline-job runner
dispatching on stage, and an execution log with keep-last-100
truncation (scheduler_manager.py:285 ``logs = logs[-100:]``).

Spark-first stance: at cluster scale, cron belongs to the orchestrator
(Airflow / Databricks Jobs / k8s CronJob), so the core here is
deliberately engine-free and deterministic — a pure 5-field cron
matcher plus an explicit ``run_due_jobs(now)`` tick that any external
loop (or test) can drive. APScheduler is an OPTIONAL import exactly
like the reference's heavy deps: ``start_background()`` uses it when
importable and raises a clear error when not (this container has no
APScheduler), while the polling surface stays fully functional.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

#: keep-last-N semantics of the reference execution log
#: (scheduler_manager.py:285)
LOG_KEEP = 100


# --- minimal 5-field cron (min hour dom month dow) ----------------------


def _parse_field(field: str, lo: int, hi: int) -> set[int]:
    """One cron field -> the set of matching values. Supports ``*``,
    ``*/n``, ``a-b``, ``a-b/n``, and comma lists — the subset
    CronTrigger.from_crontab accepts for the reference's presets."""
    out: set[int] = set()
    for part in field.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        out.update(v for v in rng if (v - rng.start) % step == 0)
    if not out.issubset(range(lo, hi + 1)):
        raise ValueError(f"cron field {field!r} out of range [{lo},{hi}]")
    return out


def cron_matches(expr: str, at: datetime) -> bool:
    """Does the 5-field cron expression fire at this minute?"""
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"expected 5 cron fields, got {expr!r}")
    minute, hour, dom, month, dow = parts
    return (
        at.minute in _parse_field(minute, 0, 59)
        and at.hour in _parse_field(hour, 0, 23)
        and at.day in _parse_field(dom, 1, 31)
        and at.month in _parse_field(month, 1, 12)
        # cron dow: 0=Sunday; python weekday(): 0=Monday
        and (at.weekday() + 1) % 7 in _parse_field(dow, 0, 6)
    )


def next_run_after(expr: str, now: datetime, horizon_days: int = 366) -> datetime | None:
    """First minute strictly after ``now`` the expression fires
    (minute-scan; bounded by horizon)."""
    t = now.replace(second=0, microsecond=0) + timedelta(minutes=1)
    end = now + timedelta(days=horizon_days)
    while t <= end:
        if cron_matches(expr, t):
            return t
        t += timedelta(minutes=1)
    return None


class SchedulerManager:
    """JSON-persisted schedule config + execution log, mirroring the
    reference's manager minus the always-on daemon: drive with
    ``run_due_jobs(now)`` (deterministic tick) or, where APScheduler is
    installed, ``start_background()``."""

    def __init__(self, config_dir: str, runner=None):
        """``runner(stage) -> bool`` executes one pipeline run; inject
        the real `plans.etl.run_pipeline` closure in production, a stub
        in tests. Defaults to a refusal stub so constructing a manager
        never drags a SparkSession in."""
        self.config_file = os.path.join(config_dir, "scheduler_config.json")
        self.log_file = os.path.join(config_dir, "execution_log.json")
        os.makedirs(config_dir, exist_ok=True)
        self.runner = runner
        self.jobs_config: list[dict] = []
        self._seq = 0
        self.load_config()

    # -- config persistence (scheduler_manager.py:39-60) --

    def load_config(self) -> None:
        if os.path.exists(self.config_file):
            with open(self.config_file) as f:
                self.jobs_config = json.load(f)
        else:
            self.jobs_config = []

    def save_config(self) -> None:
        with open(self.config_file, "w") as f:
            json.dump(self.jobs_config, f, indent=2, default=str)

    # -- job management (scheduler_manager.py:136-205) --

    def add_schedule(self, schedule_type: str, cron_expression: str,
                     stage: str = "full", name: str | None = None,
                     now: datetime | None = None) -> dict:
        now = now or datetime.now()
        # validate eagerly, as CronTrigger.from_crontab does
        cron_matches(cron_expression, now)
        self._seq += 1
        job = {
            "id": f"pipeline_job_{now.strftime('%Y%m%d_%H%M%S')}_{self._seq}",
            "name": name or f"Pipeline {schedule_type} Schedule",
            "type": schedule_type,
            "cron_expression": cron_expression,
            "stage": stage,
            "created": now.isoformat(),
            "next_run": (lambda n: n.isoformat() if n else None)(
                next_run_after(cron_expression, now)),
        }
        self.jobs_config.append(job)
        self.save_config()
        return job

    def remove_schedule(self, job_id: str) -> bool:
        before = len(self.jobs_config)
        self.jobs_config = [j for j in self.jobs_config if j["id"] != job_id]
        self.save_config()
        return len(self.jobs_config) < before

    def clear_all_schedules(self) -> None:
        self.jobs_config = []
        self.save_config()

    def get_active_jobs(self, now: datetime | None = None) -> list[dict]:
        now = now or datetime.now()
        out = []
        for j in self.jobs_config:
            nxt = next_run_after(j["cron_expression"], now)
            out.append({**j, "next_run": nxt.isoformat() if nxt else None})
        return out

    # -- execution (scheduler_manager.py:229-261) --

    def run_pipeline_job(self, stage: str = "full") -> bool:
        if self.runner is None:
            raise RuntimeError("no runner injected; pass runner= to "
                               "SchedulerManager")
        try:
            ok = bool(self.runner(stage))
        except Exception as e:  # the reference logs errors, never raises
            self.log_execution(stage, "error", str(e))
            return False
        self.log_execution(stage, "success" if ok else "failed")
        return ok

    def run_due_jobs(self, now: datetime | None = None) -> list[str]:
        """One deterministic scheduler tick: run every job whose cron
        matches this minute; returns the ids run."""
        now = now or datetime.now()
        ran = []
        for j in self.jobs_config:
            if cron_matches(j["cron_expression"], now):
                self.run_pipeline_job(j["stage"])
                ran.append(j["id"])
        return ran

    def start_background(self):
        """Daemon mode via APScheduler, exactly the reference's
        BackgroundScheduler wiring — optional dep, absent in this
        container (ImportError propagates with the install hint)."""
        from apscheduler.schedulers.background import BackgroundScheduler
        from apscheduler.triggers.cron import CronTrigger

        sched = BackgroundScheduler(timezone="UTC")
        for j in self.jobs_config:
            sched.add_job(
                func=self.run_pipeline_job,
                trigger=CronTrigger.from_crontab(j["cron_expression"]),
                id=j["id"], name=j["name"], args=[j["stage"]],
                replace_existing=True)
        sched.start()
        return sched

    # -- execution log, keep-last-100 (scheduler_manager.py:264-303) --

    def log_execution(self, stage: str, status: str,
                      error_message: str | None = None,
                      now: datetime | None = None) -> None:
        entry = {
            "timestamp": (now or datetime.now()).isoformat(),
            "stage": stage, "status": status,
            "error_message": error_message,
        }
        logs = self.get_execution_history(limit=None)
        logs.append(entry)
        logs = logs[-LOG_KEEP:]
        with open(self.log_file, "w") as f:
            json.dump(logs, f, indent=2, default=str)

    def get_execution_history(self, limit: int | None = 10) -> list[dict]:
        if os.path.exists(self.log_file):
            with open(self.log_file) as f:
                logs = json.load(f)
        else:
            logs = []
        return logs if limit is None else logs[-limit:]


def make_pipeline_runner(spark, warehouse: str):
    """The production runner: stage -> plans.etl.run_pipeline, mapping
    the reference's stage vocabulary (full/bronze/silver/gold) onto the
    CLI's --layer values."""
    from . import etl

    def runner(stage: str) -> bool:
        layer = {"full": "all"}.get(stage, stage)
        return etl.run_pipeline(spark, warehouse, layer=layer)

    return runner
