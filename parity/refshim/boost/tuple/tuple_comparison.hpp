#pragma once
#include "tuple.hpp"
