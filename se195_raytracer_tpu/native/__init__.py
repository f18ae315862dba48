"""native subpackage — C++ CPU reference engine."""
