from .calculator import Calculator, CALC_KW
