// Minimal stand-in for the reference's vendored CLI11 (submodule not
// checked out in this container). Used ONLY to compile the golden C++
// reference for parity testing (parity/build_reference.sh). Implements
// the surface the reference mains use: App{desc}, add_option (string /
// integer / float targets, comma-separated aliases), add_flag(bool),
// parse(argc, argv) with "--name value" and "--name=value", ParseError,
// app.exit(e).
#pragma once

#include <functional>
#include <iostream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace CLI {

struct ParseError : std::runtime_error {
    explicit ParseError(const std::string& m) : std::runtime_error(m) {}
};

struct Option {};

class App {
public:
    explicit App(std::string description = "") : desc_(std::move(description)) {}

    template <class T>
    Option* add_option(const std::string& names, T& var,
                       const std::string& = "") {
        for (const auto& n : split(names)) {
            setters_[n] = [&var, n](const std::string& s) {
                std::istringstream iss(s);
                iss >> var;
                if (iss.fail())
                    throw ParseError("bad value for " + n + ": " + s);
            };
        }
        return &opt_;
    }

    Option* add_option(const std::string& names, std::string& var,
                       const std::string& = "") {
        for (const auto& n : split(names))
            setters_[n] = [&var](const std::string& s) { var = s; };
        return &opt_;
    }

    Option* add_flag(const std::string& names, bool& var,
                     const std::string& = "") {
        for (const auto& n : split(names))
            flags_[n] = [&var]() { var = true; };
        return &opt_;
    }

    void parse(int argc, char** argv) {
        for (int i = 1; i < argc; ++i) {
            std::string arg = argv[i];
            std::string val;
            const auto eq = arg.find('=');
            bool has_val = false;
            if (eq != std::string::npos) {
                val = arg.substr(eq + 1);
                arg = arg.substr(0, eq);
                has_val = true;
            }
            auto f = flags_.find(arg);
            if (f != flags_.end() && !has_val) {
                f->second();
                continue;
            }
            auto s = setters_.find(arg);
            if (s == setters_.end())
                throw ParseError("unknown option: " + arg);
            if (!has_val) {
                if (i + 1 >= argc)
                    throw ParseError("missing value for " + arg);
                val = argv[++i];
            }
            s->second(val);
        }
    }

    int exit(const ParseError& e) const {
        std::cerr << desc_ << "\nerror: " << e.what() << std::endl;
        return 1;
    }

private:
    static std::vector<std::string> split(const std::string& names) {
        std::vector<std::string> out;
        std::string cur;
        std::istringstream iss(names);
        while (std::getline(iss, cur, ','))
            if (!cur.empty()) out.push_back(cur);
        return out;
    }

    std::string desc_;
    Option opt_;
    std::map<std::string, std::function<void(const std::string&)>> setters_;
    std::map<std::string, std::function<void()>> flags_;
};

}  // namespace CLI
