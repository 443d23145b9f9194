"""Broadcast small-side state safely (SURVEY.md §2.3 ST2).

``ray.put`` + deref-in-actor is the broadcast-join pattern, but an
ObjectRef passed inside ``fn_constructor_kwargs`` is only weakly
reachable: once the driver-side local goes out of scope the object can
be freed before a lazily-constructed actor calls ``ray.get`` on it —
which then blocks forever (ray issue #53727, observed as a pipeline
hang in 2.49).  ``broadcast()`` pins every ref in a module-level
registry for the driver process lifetime; broadcast sides are small by
contract, so the retained memory is bounded.
"""

from __future__ import annotations

from typing import Any

_LIVE_REFS: list = []


def broadcast(obj: Any):
    """ray.put an object and keep its ref alive for the process."""
    import ray

    ref = ray.put(obj)
    _LIVE_REFS.append(ref)
    return ref


def resolve(ref_or_obj: Any) -> Any:
    """ray.get when given an ObjectRef, identity otherwise (lets stages
    accept plain objects in unit tests)."""
    import ray

    if isinstance(ref_or_obj, ray.ObjectRef):
        return ray.get(ref_or_obj)
    return ref_or_obj


def pool(n):
    """Actor-pool concurrency spec: autoscaling (1, n).

    A FIXED pool size reserves n CPUs up front; two fixed pools can
    reserve every CPU and deadlock the upstream read tasks (observed:
    two concurrency=4 pools on an 8-CPU cluster stall forever).  An
    autoscaling (1, n) pool starts at one actor and grows only when
    CPUs are free.
    """
    if isinstance(n, tuple):
        return n
    return (1, max(1, int(n)))
