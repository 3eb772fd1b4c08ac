// Minimal stand-in for boost::tuple — the reference's mesh sources include
// it but only declare an unused typedef (LayeredMarchingCubesNoColor.cpp:46).
#pragma once
#include <tuple>
namespace boost {
template <class... Ts> using tuple = std::tuple<Ts...>;
using std::get;
}
