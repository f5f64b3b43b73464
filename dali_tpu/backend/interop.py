"""Python/JAX interop operators (PythonFunction, JaxFunction) — populated later;
reference ``dali/operators/python_function/``."""
