"""Composable stop conditions for optym optimizers.

Rebuild of ``prysm/x/optym/governors.py``; this is host-side control flow
observing per-step records (device arrays are reduced to floats only at the
decision points).
"""
import numpy as np


class StepRecord:
    """Observation of one completed optimizer step."""

    __slots__ = ('optimizer', 'iteration', 'x', 'f', 'g', 'x_next', 'metadata')

    def __init__(self, optimizer, iteration, x, f, g, x_next, metadata=None):
        self.optimizer = optimizer
        self.iteration = int(iteration)
        self.x = x
        self.f = float(f)
        self.g = g
        self.x_next = x_next
        self.metadata = {} if metadata is None else dict(metadata)


class GovernorDecision:
    """Decision returned by a governor: stop / success / message."""

    __slots__ = ('stop', 'success', 'message')

    def __init__(self, stop=False, success=False, message=''):
        self.stop = bool(stop)
        self.success = bool(success)
        self.message = message

    def __bool__(self):
        """Return the stop flag."""
        return self.stop


class OptimizationResult:
    """Result from a governed optimizer run."""

    __slots__ = ('x', 'success', 'message', 'nit', 'nfev', 'njev',
                 'decision', 'records', 'optimizer')

    def __init__(self, x, decision, records, optimizer=None):
        self.x = x
        self.success = bool(decision.success)
        self.message = decision.message
        self.nit = len(records)
        self.nfev = getattr(optimizer, 'nfev', None)
        self.njev = getattr(optimizer, 'njev', None)
        self.decision = decision
        self.records = records
        self.optimizer = optimizer

    def __repr__(self):
        """Return a compact representation."""
        return (f'OptimizationResult(success={self.success}, '
                f'message={self.message!r}, nit={self.nit})')


class Governor:
    """Base class for reusable optimizer stop conditions."""

    def observe(self, record):
        """Observe a step record."""
        return GovernorDecision(False, False, '')


class AnyGovernor(Governor):
    """Stop when any child governor stops."""

    def __init__(self, governors):
        self.governors = tuple(governors)

    def observe(self, record):
        """Return the first stopping child decision."""
        decisions = [g.observe(record) for g in self.governors]
        for decision in decisions:
            if decision.stop:
                return decision
        return GovernorDecision(False, False, '')


class AllGovernor(Governor):
    """Stop after every child governor has stopped at least once."""

    def __init__(self, governors):
        self.governors = tuple(governors)
        self._decisions = [None] * len(self.governors)

    def observe(self, record):
        """Stop once all child governors have stopped at least once."""
        for idx, governor in enumerate(self.governors):
            decision = governor.observe(record)
            if decision.stop:
                self._decisions[idx] = decision
        if self._decisions and all(d is not None for d in self._decisions):
            success = all(d.success for d in self._decisions)
            message = '; '.join(d.message for d in self._decisions if d.message)
            return GovernorDecision(True, success, message)
        return GovernorDecision(False, False, '')


def _validate_nonnegative(value, name):
    if value < 0:
        raise ValueError(f'{name} must be nonnegative')


def _vector_norm(x, norm):
    x = np.asarray(x)
    if x.size == 0:
        return 0.0
    if norm == np.inf or norm == 'inf':
        return float(np.max(np.abs(x)))
    return float(np.linalg.norm(x.ravel(), ord=norm))


class MaxIterations(Governor):
    """Stop after a fixed number of accepted optimizer steps."""

    def __init__(self, n):
        n = int(n)
        _validate_nonnegative(n, 'n')
        self.n = n

    def observe(self, record):
        """Stop when record.iteration reaches n."""
        if record.iteration >= self.n:
            return GovernorDecision(True, False, 'maximum iterations reached')
        return GovernorDecision(False, False, '')


class MaxEvaluations(Governor):
    """Stop when optimizer.nfev reaches a fixed limit."""

    def __init__(self, n):
        n = int(n)
        _validate_nonnegative(n, 'n')
        self.n = n

    def observe(self, record):
        """Stop when the optimizer reports nfev >= n."""
        nfev = getattr(record.optimizer, 'nfev', None)
        if nfev is not None and nfev >= self.n:
            return GovernorDecision(True, False,
                                    'maximum function evaluations reached')
        return GovernorDecision(False, False, '')


class FunctionTolerance(Governor):
    """Stop when consecutive objective values change by no more than ftol."""

    def __init__(self, ftol, relative=True):
        _validate_nonnegative(float(ftol), 'ftol')
        self.ftol = float(ftol)
        self.relative = bool(relative)
        self._previous_f = None

    def observe(self, record):
        """Stop when consecutive function values differ by <= ftol."""
        has_f_next = 'f_next' in record.metadata
        current_f = float(record.metadata.get('f_next', record.f))
        previous_f = self._previous_f
        if previous_f is None:
            if not has_f_next:
                self._previous_f = current_f
                return GovernorDecision(False, False, '')
            previous_f = record.f
        self._previous_f = current_f
        scale = 1.0
        if self.relative:
            scale = max(1.0, abs(previous_f), abs(current_f))
        if abs(previous_f - current_f) <= self.ftol * scale:
            return GovernorDecision(True, True, 'function tolerance reached')
        return GovernorDecision(False, False, '')


class GradientTolerance(Governor):
    """Stop when the gradient norm is below gtol."""

    def __init__(self, gtol, norm=np.inf):
        _validate_nonnegative(float(gtol), 'gtol')
        self.gtol = float(gtol)
        self.norm = norm

    def observe(self, record):
        """Stop when the gradient norm is below gtol."""
        if _vector_norm(record.g, self.norm) <= self.gtol:
            return GovernorDecision(True, True, 'gradient tolerance reached')
        return GovernorDecision(False, False, '')


class StepTolerance(Governor):
    """Stop when the optimizer step norm is below xtol."""

    def __init__(self, xtol, relative=True, norm=np.inf):
        _validate_nonnegative(float(xtol), 'xtol')
        self.xtol = float(xtol)
        self.relative = bool(relative)
        self.norm = norm

    def observe(self, record):
        """Stop when the step norm is below xtol."""
        step_norm = _vector_norm(np.asarray(record.x_next) - np.asarray(record.x),
                                 self.norm)
        scale = 1.0
        if self.relative:
            scale = max(1.0, _vector_norm(record.x, self.norm))
        if step_norm <= self.xtol * scale:
            return GovernorDecision(True, True, 'step tolerance reached')
        return GovernorDecision(False, False, '')


class ConstraintTolerance(Governor):
    """Stop when reported constraint violation is below tol."""

    def __init__(self, tol):
        _validate_nonnegative(float(tol), 'tol')
        self.tol = float(tol)

    def observe(self, record):
        """Stop when the reported constraint violation is below tol."""
        violation = record.metadata.get('constraint_violation', None)
        if violation is None:
            violation = getattr(record.optimizer, 'constraint_violation', None)
        if violation is not None and float(violation) <= self.tol:
            return GovernorDecision(True, True, 'constraint tolerance reached')
        return GovernorDecision(False, False, '')
