"""OS-process worker farming — the Distributed.jl analog.

The reference's entire distribution story is process-based: ``addprocs``
spawns worker processes and hyperopt pmaps fold/trial closures onto them
through a ``CachingPool`` (tuning.jl:22,112; random_search.jl:114-116;
evaluate.jl:270-297; its tests spawn 5 real workers, test/hyperopt.jl:17-25).
:class:`ProcessFarm` is the same shape for this package: a pool of plain
``subprocess`` Python workers (fresh interpreters — never forked, JAX
runtimes don't survive fork; and not ``multiprocessing`` spawn, whose
main-module re-import breaks unguarded user scripts), connected over an
authenticated local socket.  Job closures ship via cloudpickle (the
CachingPool analog: the function is broadcast once per distinct closure —
byte-identical consecutive maps skip the re-send — and jobs carry only
their items), results return in input order, and the first worker error
is re-raised in the parent.

Each worker configures JAX before first use:

* ``platform`` — pin the worker's JAX platform.  The default ``"cpu"`` is
  the sane choice on an accelerator host: fold jobs run on host cores in
  true OS-process isolation while the parent keeps the TPU (the reference's
  CPU worker model).  ``platform=None`` inherits the parent's default.
* ``worker_env`` — optional per-worker environment overrides passed to the
  child's spawn (e.g. ``TPU_VISIBLE_DEVICES`` to give each worker its own
  chip on a multi-chip host) — applied before the child imports JAX.
* ``distributed`` — optional per-worker ``(coordinator_address,
  num_processes, process_id)`` triples: each worker calls
  ``jax.distributed.initialize`` with its triple, becoming one process of a
  multi-host JAX job.

Multi-host mapping (documented contract): ProcessFarm workers are LOCAL
processes — one per device group of this host.  Scaling *farming* across
hosts composes the two existing axes instead of reinventing ssh transport:
run one ProcessFarm per host (each host's launcher farms its share of
folds/trials locally), or — for a single model too big for one host —
skip farming and train through the GSPMD mesh path (``fit_mps(mesh=...)``),
where ``jax.distributed.initialize`` + the dp mesh collectives span hosts
natively.
"""

from __future__ import annotations

import atexit
import os
import subprocess
import sys
import traceback
from dataclasses import dataclass, field
from multiprocessing.connection import Connection, Listener, wait
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

__all__ = ["ProcessFarm"]


def _worker_entry(address: str, authkey_hex: str) -> None:
    """Worker main: connect back to the parent, receive the config, then
    serve ("fn" | "job" | "stop") messages until told to stop."""
    from multiprocessing.connection import Client

    conn = Client(address, authkey=bytes.fromhex(authkey_hex))
    cfg = conn.recv()

    import jax

    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    if cfg.get("x64"):
        jax.config.update("jax_enable_x64", True)
    dist = cfg.get("distributed")
    if dist is not None:
        coordinator, num_processes, process_id = dist
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    import cloudpickle

    conn.send(("ready",))
    fn: Optional[Callable] = None
    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            return
        kind = msg[0]
        if kind == "stop":
            return
        if kind == "fn":
            fn = cloudpickle.loads(msg[1])
            continue
        _, idx, item_b = msg
        try:
            result = fn(cloudpickle.loads(item_b))
            conn.send((idx, True, cloudpickle.dumps(result)))
        except BaseException as e:                            # noqa: BLE001
            try:
                err_b = cloudpickle.dumps(e)
            except Exception:                                 # noqa: BLE001
                err_b = None
            conn.send((idx, False, (err_b, traceback.format_exc())))


@dataclass
class _Worker:
    wid: int
    proc: subprocess.Popen
    conn: Connection


@dataclass
class ProcessFarm:
    """A pool of subprocess workers with a DeviceFarm-compatible ``map``
    (order-preserving, first-error-wins) — pass it as the ``devices=``
    argument of :func:`tune` / :func:`evaluate` to farm fold jobs across
    OS processes instead of local devices (string spellings
    ``devices="processes"`` / ``"processes:N"`` construct one implicitly).

    Workers spawn lazily on the first ``map`` and persist across calls
    (CachingPool semantics); ``close()`` (or interpreter exit) stops them.
    """

    n_workers: int = 0                    # 0 -> min(4, cpu_count)
    platform: Optional[str] = "cpu"
    x64: Optional[bool] = None            # None -> inherit parent setting
    worker_env: Optional[Sequence[Dict[str, str]]] = None
    distributed: Optional[Sequence[Tuple[str, int, int]]] = None
    _workers: List[_Worker] = field(default_factory=list, repr=False)
    _listener: Any = field(default=None, repr=False)
    _last_fn_sha: Optional[str] = field(default=None, repr=False)
    #: observability: ``{"jobs": n, "workers": [wids that ran >=1 job]}``
    #: for the most recent :meth:`map` (lets callers/tests verify how many
    #: workers a farmed axis actually kept busy)
    last_map_stats: Optional[Dict[str, Any]] = field(default=None, repr=False)

    def __post_init__(self):
        if self.n_workers <= 0:
            # infer the worker count from a per-worker sequence when given
            seqs = [len(s) for s in (self.worker_env, self.distributed)
                    if s is not None]
            self.n_workers = min(seqs) if seqs \
                else min(4, os.cpu_count() or 1)
        for name in ("worker_env", "distributed"):
            seq = getattr(self, name)
            if seq is not None and len(seq) < self.n_workers:
                raise ValueError(
                    f"ProcessFarm({name}=...) has {len(seq)} entries for "
                    f"{self.n_workers} workers — provide one per worker")

    # -- DeviceFarm-compatible surface -------------------------------------
    @property
    def devices(self) -> List[str]:
        """Placeholder identifiers (len() drives fold-vs-trial farming
        decisions exactly as a device list does)."""
        return [f"process:{i}" for i in range(self.n_workers)]

    def _ensure_workers(self) -> None:
        if self._workers:
            return
        if self.x64 is None:
            import jax
            x64 = bool(jax.config.read("jax_enable_x64"))
        else:
            x64 = bool(self.x64)
        authkey = os.urandom(16)
        self._listener = Listener(family="AF_UNIX", authkey=authkey)
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        for i in range(self.n_workers):
            env = dict(os.environ)
            # the package must be importable in the bare child interpreter
            pp = env.get("PYTHONPATH", "")
            if repo_root not in pp.split(os.pathsep):
                env["PYTHONPATH"] = (repo_root + os.pathsep + pp).rstrip(
                    os.pathsep)
            env.update((self.worker_env[i] if self.worker_env else None)
                       or {})
            code = ("from mpstime_tpu.parallel.procfarm import "
                    f"_worker_entry; _worker_entry({self._listener.address!r},"
                    f" {authkey.hex()!r})")
            proc = subprocess.Popen([sys.executable, "-c", code], env=env)
            conn = self._accept_from(proc, i)
            cfg = dict(platform=self.platform, x64=x64)
            if self.distributed is not None:
                cfg["distributed"] = tuple(self.distributed[i])
            conn.send(cfg)
            self._workers.append(_Worker(i, proc, conn))
        # workers initialize JAX concurrently; wait for all of them
        for w in self._workers:
            msg = w.conn.recv()
            assert msg == ("ready",), msg
        atexit.register(self.close)

    def _accept_from(self, proc: subprocess.Popen, wid: int,
                     timeout_s: float = 120.0) -> Connection:
        """accept() that notices a worker dying before it connects (e.g. an
        import failure in the child) instead of blocking forever.  The
        blocking accept runs in a helper thread polled against the child's
        liveness — no reliance on multiprocessing.connection internals."""
        import queue
        import threading

        out: "queue.Queue" = queue.Queue(maxsize=1)

        def _accept():
            try:
                out.put(("ok", self._listener.accept()))
            except BaseException as e:              # noqa: BLE001
                out.put(("err", e))                 # listener closed/torn

        th = threading.Thread(target=_accept, daemon=True)
        th.start()
        deadline = timeout_s
        while True:
            try:
                kind, val = out.get(timeout=1.0)
            except queue.Empty:
                deadline -= 1.0
                if proc.poll() is not None:
                    self.close()    # closes the listener -> unblocks th
                    raise RuntimeError(
                        f"ProcessFarm worker {wid} exited with code "
                        f"{proc.returncode} before connecting (import "
                        "failure in the child environment?)")
                if deadline <= 0:
                    proc.kill()
                    self.close()
                    raise RuntimeError(
                        f"ProcessFarm worker {wid} did not connect "
                        f"within {timeout_s:.0f}s")
                continue
            if kind == "ok":
                return val
            raise val

    def map(self, fn: Callable[[Any], Any], items) -> List[Any]:
        """Run ``fn`` over ``items`` across the worker pool.  ``fn`` and the
        items ship via cloudpickle (closures over arrays are fine); ``fn``
        is broadcast once per call.  Results keep input order; the first
        worker exception is re-raised here (original object when it
        unpickles, else a RuntimeError carrying the worker traceback)."""
        import cloudpickle

        items = list(items)
        if not items:
            return []
        self._ensure_workers()
        fn_b = cloudpickle.dumps(fn)
        import hashlib
        fn_sha = hashlib.sha1(fn_b).hexdigest()
        if fn_sha != self._last_fn_sha:
            # skip the re-broadcast when consecutive maps ship byte-identical
            # closures (workers keep the last fn).  Invalidate BEFORE the
            # send loop: an interrupted broadcast must not leave a stale sha
            # claiming all workers hold the new fn.
            self._last_fn_sha = None
            for w in self._workers:
                w.conn.send(("fn", fn_b))
            self._last_fn_sha = fn_sha

        results: List[Any] = [None] * len(items)
        pending = list(enumerate(items))[::-1]
        idle = list(self._workers)
        busy: Dict[Connection, _Worker] = {}
        error: Optional[BaseException] = None
        used: set = set()
        while (pending and error is None) or busy:
            while pending and idle and error is None:
                i, it = pending.pop()
                w = idle.pop()
                w.conn.send(("job", i, cloudpickle.dumps(it)))
                used.add(w.wid)
                busy[w.conn] = w
            if not busy:
                break
            ready = wait(list(busy), timeout=5)
            if not ready:
                dead = [w.wid for w in busy.values()
                        if w.proc.poll() is not None]
                if dead:
                    self.close()
                    raise RuntimeError(
                        f"ProcessFarm worker(s) {dead} died without "
                        "reporting a result")
                continue
            for conn in ready:
                w = busy.pop(conn)
                try:
                    idx, ok, payload = conn.recv()
                except (EOFError, OSError):
                    self.close()
                    raise RuntimeError(f"ProcessFarm worker {w.wid} "
                                       "disconnected mid-job")
                idle.append(w)
                if ok:
                    results[idx] = cloudpickle.loads(payload)
                elif error is None:
                    err_b, tb = payload
                    if err_b is not None:
                        try:
                            error = cloudpickle.loads(err_b)
                        except Exception:                     # noqa: BLE001
                            error = None
                    if error is None:
                        error = RuntimeError(
                            f"ProcessFarm worker {w.wid} failed:\n{tb}")
        self.last_map_stats = {"jobs": len(items), "workers": sorted(used)}
        if error is not None:
            raise error
        return results

    def close(self) -> None:
        """Stop all workers (idempotent)."""
        for w in self._workers:
            try:
                w.conn.send(("stop",))
            except (BrokenPipeError, OSError):
                pass
        for w in self._workers:
            try:
                w.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                w.proc.terminate()
                try:
                    w.proc.wait(timeout=5)
                except subprocess.TimeoutExpired:
                    w.proc.kill()
            w.conn.close()
        self._workers = []
        self._last_fn_sha = None
        if self._listener is not None:
            self._listener.close()
            self._listener = None

    def __enter__(self) -> "ProcessFarm":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
