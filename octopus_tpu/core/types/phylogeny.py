"""Rooted clone phylogenies.

Capability-equivalent to the reference's Phylogeny<Label, T>
(src/core/types/phylogeny.hpp:20-294): a small rooted tree of labelled
groups with founder/descendant structure, used by the single-cell caller to
describe clone topologies.  Adds what the caller needs on top of the
reference API: enumeration of all tree shapes up to a size limit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator


@dataclass
class Group:
    id: Any
    value: Any = None


class Phylogeny:
    """Small rooted tree; nodes addressed by group id."""

    def __init__(self, founder: Group | None = None):
        self._parent: dict = {}
        self._children: dict = {}
        self._groups: dict = {}
        self._founder_id = None
        if founder is not None:
            self.set_founder(founder)

    # -- structure -----------------------------------------------------------

    def set_founder(self, group: Group) -> Group:
        self._groups = {group.id: group}
        self._parent = {group.id: None}
        self._children = {group.id: []}
        self._founder_id = group.id
        return group

    def add_descendant(self, group: Group, ancestor_id) -> Group:
        if ancestor_id not in self._groups:
            raise KeyError(ancestor_id)
        self._groups[group.id] = group
        self._parent[group.id] = ancestor_id
        self._children[group.id] = []
        self._children[ancestor_id].append(group.id)
        return group

    def clear(self, group_id=None) -> None:
        """Remove the subtree rooted at group_id (everything when None)."""
        if group_id is None:
            self._parent.clear()
            self._children.clear()
            self._groups.clear()
            self._founder_id = None
            return
        for child in list(self._children.get(group_id, [])):
            self.clear(child)
        parent = self._parent.pop(group_id, None)
        if parent is not None:
            self._children[parent].remove(group_id)
        self._children.pop(group_id, None)
        self._groups.pop(group_id, None)
        if group_id == self._founder_id:
            self._founder_id = None

    # -- queries --------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._groups)

    def empty(self) -> bool:
        return not self._groups

    @property
    def founder(self) -> Group:
        return self._groups[self._founder_id]

    def group(self, group_id) -> Group:
        return self._groups[group_id]

    def groups(self) -> list[Group]:
        return list(self._groups.values())

    def ancestor(self, group_id) -> Group | None:
        pid = self._parent.get(group_id)
        return None if pid is None else self._groups[pid]

    def descendants(self, group_id) -> list[Group]:
        return [self._groups[c] for c in self._children.get(group_id, [])]

    def num_descendants(self, group_id) -> int:
        return len(self._children.get(group_id, []))

    def traverse_preorder(self) -> Iterator[Group]:
        if self._founder_id is None:
            return
        stack = [self._founder_id]
        while stack:
            gid = stack.pop()
            yield self._groups[gid]
            stack.extend(reversed(self._children[gid]))

    def serialize(self) -> tuple:
        """Hashable shape+label encoding (preorder (id, parent) pairs)."""
        return tuple((g.id, self._parent[g.id]) for g in self.traverse_preorder())

    def copy(self) -> "Phylogeny":
        out = Phylogeny()
        for g in self.traverse_preorder():
            if self._parent[g.id] is None:
                out.set_founder(Group(g.id, g.value))
            else:
                out.add_descendant(Group(g.id, g.value), self._parent[g.id])
        return out


def enumerate_tree_shapes(n_nodes: int) -> list[list[int | None]]:
    """All rooted labelled tree shapes on nodes 0..n-1 with node 0 the
    founder and parents earlier than children; each shape is a parent list
    (parent[0] is None).  Node labels are attachment-ordered, which matches
    the reference CellCaller's phylogeny proposals."""
    shapes: list[list[int | None]] = []

    def grow(parents: list[int | None]):
        if len(parents) == n_nodes:
            shapes.append(parents.copy())
            return
        for anc in range(len(parents)):
            parents.append(anc)
            grow(parents)
            parents.pop()

    grow([None])
    return shapes


__all__ = ["Phylogeny", "Group", "enumerate_tree_shapes"]
