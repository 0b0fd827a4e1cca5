"""HumanEval pass@k harness (reference: evaluation/humaneval_utils.py).

Model-agnostic: takes a `complete_fn(prompt) -> list[str]` producing
candidate completions (so it works with the JAX CausalLM, an HF model,
or cached generations).  Parity pieces:

* sandboxed execution of candidate programs in a subprocess with
  resource limits (reliability_guard + unsafe_execute semantics,
  humaneval_utils.py:112-265, re-designed around subprocess isolation
  instead of in-process monkey-patching);
* the unbiased pass@k estimator (estimate_pass_at_k,
  humaneval_utils.py:268-292).
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import tempfile
from typing import Callable, Dict, Iterable, List, Sequence

import numpy as np

# Defense-in-depth for untrusted model-generated code: resource limits,
# plus reliability_guard-style neutering of destructive interpreter
# surface (humaneval_utils.py:367-464 semantics, re-designed): the
# subprocess runs chdir'd into an empty scratch dir (see
# check_correctness), cannot write large files (RLIMIT_FSIZE), cannot
# spawn processes, and every destructive os/shutil entry point is
# replaced before the candidate executes.  This is best-effort Python-
# level containment — run the whole harness inside a container for
# hostile inputs.
_SANDBOX_PRELUDE = """
import resource, sys, builtins, os, shutil, subprocess
resource.setrlimit(resource.RLIMIT_AS, (2_000_000_000, 2_000_000_000))
resource.setrlimit(resource.RLIMIT_CPU, (10, 10))
resource.setrlimit(resource.RLIMIT_FSIZE, (1_000_000, 1_000_000))
os.environ.clear()
builtins.exit = None
builtins.quit = None
builtins.help = None
for _name in ("kill", "killpg", "system", "popen", "fork", "forkpty",
              "remove", "removedirs", "rmdir", "unlink", "rename",
              "renames", "replace", "truncate", "chmod", "chown",
              "chroot", "setuid", "setgid", "fchdir", "putenv"):
    if hasattr(os, _name):
        setattr(os, _name, None)
for _name in ("rmtree", "move", "chown"):
    setattr(shutil, _name, None)
subprocess.Popen = None
subprocess.run = None
subprocess.call = None
subprocess.check_call = None
subprocess.check_output = None
sys.modules["ipdb"] = None
sys.modules["joblib"] = None
sys.modules["psutil"] = None
"""


def check_correctness(problem: Dict, completion: str, timeout: float = 10.0,
                      completion_id: int = 0) -> Dict:
    """Run one candidate program against the problem's tests in an
    isolated subprocess (humaneval_utils.py:112-180 semantics)."""
    program = "\n".join([
        _SANDBOX_PRELUDE,
        problem["prompt"],
        completion,
        problem["test"],
        f"check({problem['entry_point']})",
    ])
    # program file lives OUTSIDE the scratch cwd so the candidate can't
    # read or clobber it; the subprocess sees only an empty directory
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "prog.py")
        scratch = os.path.join(tmp, "scratch")
        os.mkdir(scratch)
        with open(path, "w") as f:
            f.write(program)
        try:
            proc = subprocess.run([sys.executable, path], capture_output=True,
                                  timeout=timeout, cwd=scratch)
            passed = proc.returncode == 0
            result = "passed" if passed else f"failed: {proc.stderr[-300:].decode(errors='replace')}"
        except subprocess.TimeoutExpired:
            passed, result = False, "timed out"
    return {"task_id": problem.get("task_id"), "passed": passed,
            "result": result, "completion_id": completion_id}


def estimate_pass_at_k(num_samples, num_correct, k: int) -> np.ndarray:
    """Unbiased pass@k (humaneval_utils.py:268-292)."""

    def estimator(n: int, c: int, k: int) -> float:
        if n - c < k:
            return 1.0
        return 1.0 - np.prod(1.0 - k / np.arange(n - c + 1, n + 1))

    if isinstance(num_samples, int):
        num_samples_it = itertools.repeat(num_samples, len(num_correct))
    else:
        assert len(num_samples) == len(num_correct)
        num_samples_it = iter(num_samples)
    return np.array([estimator(int(n), int(c), k)
                     for n, c in zip(num_samples_it, num_correct)])


def eval_humaneval(complete_fn: Callable[[str], List[str]],
                   problems: Iterable[Dict],
                   ks: Sequence[int] = (1, 10),
                   out_path: str | None = None) -> Dict[str, float]:
    """Full harness (humaneval_utils.py:34-110): generate candidates per
    problem, sandbox-execute, report pass@k.

    The reference samples candidates at temperature=0.2 / top_p=0.95
    (humaneval_utils.py:85-95); build the matching complete_fn with
    ``CausalLM.generate(..., temperature=0.2, top_p=0.95, seed=i)``
    per candidate i."""
    totals, corrects, records = [], [], []
    for problem in problems:
        completions = complete_fn(problem["prompt"])
        results = [check_correctness(problem, c, completion_id=i)
                   for i, c in enumerate(completions)]
        totals.append(len(results))
        corrects.append(sum(r["passed"] for r in results))
        records.extend(results)
    out = {f"pass@{k}": float(estimate_pass_at_k(totals, corrects, k).mean())
           for k in ks if all(t >= k for t in totals)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"metrics": out, "results": records}, f, indent=2)
    return out
