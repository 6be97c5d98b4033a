"""Session lifecycle hooks — the mn-slaved hook analog.

The reference's slave daemon stores user-supplied hook scripts and
runs them at fixed lifecycle points (hook.c:31-105: exactly two hook
names, "session-complete" and "cleanup", executed via system()), while
the session row in MySQL transitions running -> 'hook' -> 'done'
around the invocation (client.c:470-486 nol_session updates).

Spark analog: a crawl run IS a session. ``SessionHooks`` carries the
two hooks — each either a Python callable (called with the session
info dict) or a shell command string (the system() analog, run with
the session info exported as NOL_* environment variables). The
engine (plans/crawl.py) appends session rows to the snapshot store's
``sessions`` table with the same state transitions; the
session-complete hook runs between the 'hook' and 'done' states, and
the cleanup hook runs from ``SparkCrawler.close()`` (the slave's
shutdown path, main.c:230).
"""

from __future__ import annotations

import os
import subprocess
from typing import Callable, Dict, Optional, Union

Hook = Union[Callable[[dict], None], str]

HOOK_SESSION_COMPLETE = "session-complete"
HOOK_CLEANUP = "cleanup"
HOOK_NAMES = (HOOK_SESSION_COMPLETE, HOOK_CLEANUP)


class SessionHooks:
    """The two lifecycle hooks, keyed by the reference's hook names."""

    def __init__(
        self,
        session_complete: Optional[Hook] = None,
        cleanup: Optional[Hook] = None,
    ):
        self._hooks: Dict[str, Optional[Hook]] = {
            HOOK_SESSION_COMPLETE: session_complete,
            HOOK_CLEANUP: cleanup,
        }

    def has(self, name: str) -> bool:
        return self._hooks.get(name) is not None

    def invoke(self, name: str, info: Optional[dict] = None) -> bool:
        """Run one hook; returns True when a hook was registered and
        ran (hook.c:87-105 returns -1 for unregistered hooks — here a
        False). Callables get the info dict; command strings run in a
        shell with the info exported as NOL_<KEY> env vars."""
        if name not in self._hooks:
            raise ValueError(
                f"unknown hook type {name!r} (hook.c:59 analog); "
                f"valid: {HOOK_NAMES}"
            )
        hook = self._hooks[name]
        if hook is None:
            return False
        info = info or {}
        if callable(hook):
            hook(dict(info))
            return True
        env = dict(os.environ)
        for k, v in info.items():
            env[f"NOL_{k.upper()}"] = str(v)
        subprocess.run(hook, shell=True, env=env, check=False)
        return True
