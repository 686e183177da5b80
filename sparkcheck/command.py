"""Command: validation + post-validation action (the terminal stage).

Re-expresses the reference's Command (/root/reference/src/index.ts:212-348):
run() gates deps/schema with the exact invariant messages (:271-278),
validates, and on success executes the action with a FRESH ErrorBag (:292) —
validation errors never leak into the execution step. Failure attribution:
step="validation" carries the failing rule (:282-289); step="execution" fires
when the action wrote the bag (:302-309) or returned an ErrorBag (:312-319).
Exceptions inside execute propagate (the reference has no try/catch; graceful
actions catch internally and write the bag —
src/order-cancellation.example.ts:191-225).

Two run surfaces:
- run_single(df)  — parity mode for 1-row inputs; returns a CommandResult
  shaped exactly like the reference's, so ported specs assert verbatim.
- run(df, ...)    — production mode: validate the whole table, apply the gate
  policy, execute the sink action, and return (ValidationResult,
  CommandResult-ish record).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

from .errors import ErrorBag
from .model import ValidatorBuilder, invariant


@dataclass
class CommandResult:
    success: bool
    step: Optional[str] = None          # 'validation' | 'execution' | None
    rule: Optional[dict] = None         # {id, description} of failing rule
    errors: Optional[ErrorBag] = None
    result: Any = None
    context: Optional[dict] = None


class Command:
    def __init__(self, builder: ValidatorBuilder,
                 execute: Callable[..., Any]) -> None:
        self._builder = builder
        self._execute = execute

    def provide(self, **deps: Any) -> "Command":
        self._builder.provide(**deps)
        return self

    # -- parity surface ------------------------------------------------------

    def run_single(self, df, override: dict | None = None,
                   run_ts=None) -> CommandResult:
        """Reference Command.run for a 1-row input DataFrame."""
        invariant(self._builder._deps_status != "required",
                  "Deps should be provided before calling run")
        invariant(self._builder._schema is not None,
                  "Schema must be defined before calling command")

        validation = self._builder.validate(df, override=override,
                                            run_ts=run_ts)
        single = validation.single()
        if not single.success:
            return CommandResult(success=False, errors=single.errors,
                                 step="validation", rule=single.rule)

        execution_bag = ErrorBag()  # fresh bag (src/index.ts:292)
        data = {c: v for c, v in
                validation.annotated.collect()[0].asDict().items()
                if not c.startswith("_")}
        execute_result = self._execute(data=data, deps=self._builder._deps,
                                       context=single.context,
                                       bag=execution_bag)
        if execution_bag.has_errors():
            return CommandResult(success=False, errors=execution_bag,
                                 step="execution", rule=None)
        if isinstance(execute_result, ErrorBag):
            return CommandResult(success=False, errors=execute_result,
                                 step="execution", rule=None)
        return CommandResult(success=True, result=execute_result,
                             context=single.context)

    def run_shape(self, df, override: dict | None = None,
                  run_ts=None) -> CommandResult:
        """Typed alias of run (B15; src/index.ts:328-347) — same runtime,
        extra deps gate with the reference's exact message."""
        invariant(self._builder._deps_status != "required",
                  "Deps should be provided before calling runShape")
        return self.run_single(df, override=override, run_ts=run_ts)

    # -- production surface ---------------------------------------------------

    def run(self, df, override: dict | None = None, run_ts=None,
            gate: str = "run_checks") -> tuple[Any, CommandResult]:
        """Validate the table, gate, then execute the sink action.

        gate policy:
          'run_checks'    — fail validation step only if a run-level check
                            (drift) failed; per-row violations are data, not
                            a reason to abort the pipeline.
          'any_violation' — strict: any failing row aborts before the action.
        """
        invariant(self._builder._deps_status != "required",
                  "Deps should be provided before calling run")
        invariant(self._builder._schema is not None,
                  "Schema must be defined before calling command")

        validation = self._builder.validate(df, override=override,
                                            run_ts=run_ts)
        if gate == "any_violation":
            gate_ok = validation.success()
        else:
            gate_ok = all(c.passed for c in validation.run_checks)
        if not gate_ok:
            failed = [c for c in validation.run_checks if not c.passed]
            rule = ({"id": failed[0].rule_id, "description": failed[0].metric}
                    if failed else None)
            return validation, CommandResult(success=False, step="validation",
                                             rule=rule)

        execution_bag = ErrorBag()
        execute_result = self._execute(data=validation, deps=self._builder._deps,
                                       context={}, bag=execution_bag)
        if execution_bag.has_errors():
            return validation, CommandResult(success=False, errors=execution_bag,
                                             step="execution")
        if isinstance(execute_result, ErrorBag):
            return validation, CommandResult(success=False,
                                             errors=execute_result,
                                             step="execution")
        return validation, CommandResult(success=True, result=execute_result)
