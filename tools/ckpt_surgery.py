"""Surgical checkpoint editing: drop / inspect parameters by name.

The reference keeps a commented-out helper that deletes named parameters from a
checkpoint's model and optimizer states before resuming with a changed architecture
(``/root/reference/a016_train.py:341-357``). This is the working equivalent for Orbax
checkpoints: prune subtrees by dotted path (their optimizer state prunes automatically
because optax state mirrors the param tree), or just list the tree.

Usage:
    python tools/ckpt_surgery.py list  <ckpt_dir>
    python tools/ckpt_surgery.py drop  <ckpt_dir> <out_dir> path.to.param [...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}.{k}" if prefix else k)
    else:
        yield prefix, tree


def prune(tree, dotted: str):
    """Return a copy of `tree` with the subtree at dotted path removed."""
    keys = dotted.split(".")
    if len(keys) == 1:
        return {k: v for k, v in tree.items() if k != keys[0]}
    return {
        k: (prune(v, ".".join(keys[1:])) if k == keys[0] else v)
        for k, v in tree.items()
    }


def prune_matching_opt_state(opt_state, params_before, params_after):
    """optax state (e.g. Adam mu/nu) mirrors the param tree; prune the same paths."""
    before = {p for p, _ in _flatten(params_before)}
    after = {p for p, _ in _flatten(params_after)}
    dropped = before - after

    # optax ScaleByAdamState stores mu/nu as the same dict structure
    def walk(state):
        if isinstance(state, dict):
            flat = {p for p, _ in _flatten(state)}
            if dropped & flat:
                new = state
                for d in dropped:
                    new = prune(new, d)
                return new
        if isinstance(state, (list, tuple)):
            return type(state)(walk(s) for s in state)
        if hasattr(state, "_fields"):  # NamedTuple
            return type(state)(*(walk(s) for s in state))
        return state

    return walk(opt_state)


def main():
    import orbax.checkpoint as ocp

    cmd = sys.argv[1]
    src = str(Path(sys.argv[2]).resolve())
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(src)

    if cmd == "list":
        for path, leaf in _flatten(state.get("params", state)):
            shape = getattr(leaf, "shape", ())
            print(f"{path}  {tuple(shape)}")
        return

    if cmd == "drop":
        out = str(Path(sys.argv[3]).resolve())
        paths = sys.argv[4:]
        params = state["params"]
        new_params = params
        for p in paths:
            new_params = prune(new_params, p)
        state["opt_state"] = prune_matching_opt_state(
            state.get("opt_state", {}), params, new_params
        )
        state["params"] = new_params
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(out, state)
        print(f"wrote pruned checkpoint to {out} (dropped {len(paths)} paths)")
        return

    raise SystemExit(f"unknown command: {cmd}")


if __name__ == "__main__":
    main()
