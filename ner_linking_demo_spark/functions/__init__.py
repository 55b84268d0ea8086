"""Pure / columnar building blocks shared by operators, oracle and tests."""
