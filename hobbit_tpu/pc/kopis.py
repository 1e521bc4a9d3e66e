"""Kopis polynomial commitment — intentionally empty.

The reference ships ``Kopis.{h,cpp}`` as empty placeholder files (0 LoC);
this module mirrors that inventory slot.  If a Kopis-style homomorphic PC
is ever needed, it slots in behind the same commit/open/verify interface
as the other ``hobbit_tpu.pc`` backends.
"""

__all__: list = []
