"""Transformation groups (A13): user-declared composite operators.

Reference semantics (br/uff/spark/TransformationGroup.scala:6-33,
TransformationGroupManager.scala:15-70): a group is a set of init +
intermediary tasks closed by exactly one finish task; invariants —
(1) a lineage may be inside at most one open group at a time,
(2) a group has a single finisher,
(3) membership is all-or-nothing along the enclosed lineage.
Violations raise (the reference throws IllegalStateException).

Our API is a context manager::

    with engine.group("Mafft...Raxml"):
        df2 = df.select(...)
        df3 = df2.where(...)
"""

from __future__ import annotations

import uuid
from typing import Optional


class TransformationGroup:
    def __init__(self, name: str):
        self.group_id = str(uuid.uuid4())
        self.name = name
        self.init_tasks: list[str] = []
        self.intermediary_tasks: list[str] = []
        self.finish_task: Optional[str] = None
        self.closed = False

    def add_task(self, task_id: str, is_init: bool) -> None:
        if self.closed:
            raise RuntimeError(
                f"transformation group '{self.name}' is already finished"
            )
        (self.init_tasks if is_init else self.intermediary_tasks).append(task_id)

    def finish(self, task_id: str) -> None:
        if self.finish_task is not None:
            raise RuntimeError(
                f"transformation group '{self.name}' already has a finish task"
            )
        self.finish_task = task_id
        self.closed = True


class GroupManager:
    def __init__(self, session):
        self.session = session
        self.current: Optional[TransformationGroup] = None

    def scope(self, name: str):
        manager = self

        class _Scope:
            def __enter__(self_inner):
                if manager.current is not None:
                    raise RuntimeError(
                        "a lineage can belong to only one open transformation "
                        f"group (open: '{manager.current.name}')"
                    )
                manager.current = TransformationGroup(name)
                return manager.current

            def __exit__(self_inner, *exc):
                group = manager.current
                manager.current = None
                if group is not None and exc[0] is None:
                    # Last registered task becomes the finisher.
                    members = group.init_tasks + group.intermediary_tasks
                    if members:
                        finish = members[-1]
                        if finish in group.intermediary_tasks:
                            group.intermediary_tasks.remove(finish)
                        else:
                            group.init_tasks.remove(finish)
                        group.finish(finish)
                    manager.session.store.write_group(
                        manager.session.run_id,
                        group.group_id,
                        group.name,
                        group.init_tasks,
                        group.intermediary_tasks,
                        group.finish_task,
                    )
                return False

        return _Scope()

    def register(self, task_id: str, has_parent_in_group: bool) -> Optional[str]:
        if self.current is None:
            return None
        self.current.add_task(task_id, is_init=not has_parent_in_group)
        return self.current.group_id
